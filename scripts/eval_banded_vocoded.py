"""Vocoded-domain quality bound for the banded long-form attention default.

Raw mel MAE (~2e-2 at the (2,2)/640-frame band, docs/design.md round 4)
says nothing about audibility: the question is what survives the vocoder.
For each long-form bucket this solves the SAME inputs with exact full
attention (stock-flash path — the reference's exact default,
flow_matching.py:387-401) and with the banded backend, vocodes both
through HiFT, and reports perceptually-framed metrics:

  * MCD (mel-cepstral distortion, 13 cepstra via DCT of the re-extracted
    log-mel of the VOCODED wavs, standard 10/ln10*sqrt(2*sum dc^2) frame
    mean) + per-third breakdown (does divergence accumulate?);
  * log-mel distortion (MAE, dB-scaled) of the re-extracted mels;
  * F0-RMSE between the two paths' ConvRNNF0Predictor tracks (the f0
    that actually drives the NSF source) + relative error;
  * CAM++ speaker-embedding cosine between the two wavs. Weights are
    random-init in this environment, so the embedding is a fixed random
    nonlinear projection — a distance-preserving similarity proxy, not a
    calibrated speaker metric; stated in the output.

Prompted variant (--prompted): grafts a 512-frame prompt head exactly as
synthesize_long does (mu[:512]=prompt_h, cond[:512]=prompt_feat), solves
exact vs banded, strips the head, and additionally reports
cosine(generated, prompt) under each backend — the ADVICE round-4
question: with the 640-frame band, generated frames past the window have
no direct attention to the prompt head, so does the band cost prompt
similarity that exact attention keeps?

Run on TPU (the banded/flash gates are TPU-only); one process at a time
(CLAUDE.md). ~15 min warm cache. Prints one JSON line per (bucket, mode).
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

P_BUCKET = 512  # synthesize_long's cloning head (lcm(512, granule) at n_seq=1)


def _mcd(logmel_a: np.ndarray, logmel_b: np.ndarray, n_cep: int = 13):
    """Frame-mean mel-cepstral distortion (dB) from log-mel (T, M) pairs.

    Cepstra = orthonormal DCT-II of the natural-log mel; c0 (energy) is
    excluded per the standard MCD definition.
    """
    from scipy.fftpack import dct

    ca = dct(logmel_a, type=2, axis=1, norm="ortho")[:, 1 : n_cep + 1]
    cb = dct(logmel_b, type=2, axis=1, norm="ortho")[:, 1 : n_cep + 1]
    d = ca - cb
    per_frame = (10.0 / np.log(10.0)) * np.sqrt(
        2.0 * np.sum(d * d, axis=1)
    )
    return per_frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--buckets", default="2048,3072,4096,8192,12288",
        help="mel bucket lengths (512-aligned for the flash exact path)",
    )
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument(
        "--prompted", action="store_true",
        help="also run the 512-frame prompt-head (cloning) variant",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jyutvoice_tpu.audio.fbank import kaldi_fbank
    from jyutvoice_tpu.audio.mel import MelSpec
    from jyutvoice_tpu.audio.resample import resample_sinc
    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models import hift as hift_mod
    from jyutvoice_tpu.models.campplus import (
        CampPlusConfig,
        apply_campplus,
        init_campplus,
    )
    from jyutvoice_tpu.models.cfm import cfm_forward
    from jyutvoice_tpu.models.hift import apply_f0_predictor, init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.weights.noise import rand_noise_extended

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    dec = params["decoder"]
    hift_params = init_hift(jax.random.PRNGKey(1), cfg.hift)
    cp_cfg = CampPlusConfig()
    cp_params = init_campplus(jax.random.PRNGKey(2), cp_cfg)
    melspec = MelSpec()
    rng = np.random.default_rng(0)

    def spk_embed(wav24: np.ndarray) -> np.ndarray:
        wav16 = resample_sinc(wav24.astype(np.float32), 24000, 16000)
        feat = kaldi_fbank(wav16 * 32768.0, num_mel_bins=80)
        feat = feat - feat.mean(axis=0, keepdims=True)
        emb = apply_campplus(cp_params, cp_cfg, jnp.asarray(feat)[None])
        return np.asarray(emb)[0]

    def cos(a, b):
        return float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        )

    @jax.jit
    def f0_fn(p, mel):
        return apply_f0_predictor(p["f0_predictor"], mel)

    def solve_fn(t_total, banded_threshold):
        est = dataclasses.replace(
            cfg.tts.cfm.estimator, banded_long_threshold=banded_threshold
        )
        cc = dataclasses.replace(cfg.tts.cfm, estimator=est)

        @jax.jit
        def solve(dec, mu, mask, spks, cond, noise):
            return cfm_forward(
                dec, cc, mu, mask, spks, cond,
                n_timesteps=args.steps, rand_noise=noise,
            )

        return solve

    @jax.jit
    def voc_fn(p, mel):
        wav, _ = hift_mod.hift_vocode_auto(p, cfg.hift, mel, deterministic=True)
        return wav

    spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
    prompt_h = rng.standard_normal((P_BUCKET, 80)).astype(np.float32)
    prompt_feat = rng.standard_normal((P_BUCKET, 80)).astype(np.float32)

    for t_mel in (int(t) for t in args.buckets.split(",")):
        modes = [("promptless", 0)] + ([("prompted", P_BUCKET)] if args.prompted else [])
        for mode, head in modes:
            t_total = t_mel + head
            mu = np.asarray(
                rng.standard_normal((1, t_total, 80)), np.float32
            )
            cond = np.zeros((1, t_total, 80), np.float32)
            if head:
                mu[0, :head] = prompt_h
                cond[0, :head] = prompt_feat
            mask = jnp.ones((1, t_total, 1), jnp.float32)
            noise = jnp.asarray(rand_noise_extended(t_total))
            mu_j, cond_j = jnp.asarray(mu), jnp.asarray(cond)

            mels, wavs, f0s, embs = {}, {}, {}, {}
            for name, thr in (("exact", 0), ("banded", min(t_total, 2048))):
                mel = solve_fn(t_total, thr)(
                    dec, mu_j, mask, spks, cond_j, noise
                )
                mel = mel[:, head:, :]  # strip the prompt head (static here)
                wav = voc_fn(hift_params, mel)
                mels[name] = np.asarray(mel)[0]
                wavs[name] = np.asarray(wav)[0]
                f0s[name] = np.asarray(f0_fn(hift_params, mel))[0]
                embs[name] = spk_embed(wavs[name])

            mel_mae = float(np.abs(mels["banded"] - mels["exact"]).mean())
            wav_mae = float(
                np.abs(wavs["banded"] - wavs["exact"]).mean()
            )
            # spk-cosine NOISE FLOOR: the random-init embedding amplifies
            # tiny waveform perturbations (CPU smoke: cos 0.997 between
            # numerically-identical-path wavs). Embed the exact wav with a
            # 1e-4-relative perturbation: cosines above this floor are
            # indistinguishable from numerical noise.
            pert = wavs["exact"] * (
                1.0
                + 1e-4
                * rng.standard_normal(len(wavs["exact"])).astype(np.float32)
            )
            floor_cos = cos(embs["exact"], spk_embed(pert))

            # vocoded-domain: re-extract log-mel from both wavs
            relog = {
                k: np.asarray(melspec(jnp.asarray(w)[None]))[0]
                for k, w in wavs.items()
            }
            n = min(relog["exact"].shape[0], relog["banded"].shape[0])
            la, lb = relog["exact"][:n], relog["banded"][:n]
            logmel_mae_db = float(
                np.abs(la - lb).mean() * 10.0 / np.log(10.0)
            )
            mcd_frames = _mcd(la, lb)
            thirds = [
                float(mcd_frames[i * n // 3 : (i + 1) * n // 3].mean())
                for i in range(3)
            ]

            fa, fb = f0s["exact"].ravel(), f0s["banded"].ravel()
            f0_rmse = float(np.sqrt(np.mean((fa - fb) ** 2)))
            f0_rel = float(
                np.mean(np.abs(fa - fb) / (np.abs(fa) + 1e-6))
            )

            out = {
                "bucket": t_mel,
                "mode": mode,
                "steps": args.steps,
                "mel_mae": round(mel_mae, 5),
                "wav_mae": round(wav_mae, 6),
                "mcd_db": round(float(mcd_frames.mean()), 4),
                "mcd_db_p90": round(float(np.percentile(mcd_frames, 90)), 4),
                "mcd_db_thirds": [round(t, 4) for t in thirds],
                "logmel_mae_db": round(logmel_mae_db, 4),
                "f0_rmse": round(f0_rmse, 5),
                "f0_rel": round(f0_rel, 5),
                "spk_cos_banded_vs_exact": round(
                    cos(embs["banded"], embs["exact"]), 5
                ),
                "spk_cos_noise_floor": round(floor_cos, 5),
                "spk_metric": "random-init CAM++ (random-projection proxy)",
            }
            if head:
                # does the band cost prompt similarity exact keeps?
                emb_p = spk_embed(
                    np.asarray(
                        voc_fn(hift_params, jnp.asarray(prompt_feat)[None])
                    )[0]
                )
                out["spk_cos_gen_vs_prompt_exact"] = round(
                    cos(embs["exact"], emb_p), 5
                )
                out["spk_cos_gen_vs_prompt_banded"] = round(
                    cos(embs["banded"], emb_p), 5
                )
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
