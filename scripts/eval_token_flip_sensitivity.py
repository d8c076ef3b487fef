"""FSQ token-flip sensitivity (VERDICT r3 weak #4).

The native S3 tokenizer agrees with the ONNX reference on >= 95% of
tokens (rounding-boundary flips under f32 DSP noise,
tests/test_s3_tokenizer.py). This measures what a 5% token flip does
DOWNSTREAM: flow-encoder prompt hidden states (prompt_h) and the final
cloned mel. Random-init weights — the numbers are indicative scale, not
trained-model truth (documented in PARITY.md alongside the agreement
bound).

Method: random token sequence -> flow encoder -> prompt_h; flip 5% of
tokens to random other ids -> prompt_h'; graft both into the same
synthesize() call and compare mels. Localization matters as much as
magnitude: a flipped 25 Hz token should perturb its ~2 mel frames, not
the whole prompt.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.flow_encoder import (
        apply_flow_encoder,
        init_flow_encoder,
    )
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    cfg = JyutVoiceConfig()
    fecfg = cfg.flow_encoder
    fe = init_flow_encoder(jax.random.PRNGKey(3), fecfg)
    rng = np.random.default_rng(0)

    n_tok = 120  # 4.8 s prompt at 25 Hz -> 240 mel frames
    vocab = fecfg.vocab_size if hasattr(fecfg, "vocab_size") else 6561
    tokens = rng.integers(0, vocab, (1, n_tok)).astype(np.int32)
    flip = rng.random(n_tok) < 0.05
    tokens_f = tokens.copy()
    tokens_f[0, flip] = rng.integers(0, vocab, int(flip.sum()))
    print(f"flipped {int(flip.sum())}/{n_tok} tokens "
          f"({100*flip.mean():.1f}%)")

    lens = jnp.asarray([n_tok], jnp.int32)
    h0, _ = apply_flow_encoder(fe, fecfg, jnp.asarray(tokens), lens)
    h1, _ = apply_flow_encoder(fe, fecfg, jnp.asarray(tokens_f), lens)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    scale = float(np.abs(h0).mean())
    d = np.abs(h1 - h0)  # (1, 2*n_tok, 80)
    frame_err = d[0].mean(axis=1)
    # frames whose source token was flipped (x2 upsample) + 1-frame halo
    flipped_frames = np.zeros(2 * n_tok, bool)
    idx = np.where(flip)[0]
    for i in idx:
        flipped_frames[max(0, 2 * i - 2) : 2 * i + 4] = True
    print(f"prompt_h |h| mean {scale:.3f}")
    print(f"prompt_h MAE: overall {d.mean():.4f} "
          f"({100*d.mean()/scale:.1f}% of |h|)")
    print(f"  at flipped frames (+/-1 halo): {frame_err[flipped_frames].mean():.4f}")
    print(f"  away from flips:              {frame_err[~flipped_frames].mean():.4f}"
          f"  (localization ratio "
          f"{frame_err[flipped_frames].mean()/max(frame_err[~flipped_frames].mean(),1e-9):.1f}x)")

    # downstream: cloned mel with each prompt_h (same prompt_feat/text)
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
    synth = Synthesizer(cfg, params, params_hift)
    pf = rng.standard_normal((2 * n_tok, 80)).astype(np.float32)
    kw = dict(lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=2)
    a = synth.synthesize("佢係邊個", prompt_feat=pf, prompt_h=h0[0], **kw)
    b = synth.synthesize("佢係邊個", prompt_feat=pf, prompt_h=h1[0], **kw)
    mel_scale = float(np.abs(a.mel).mean())
    mel_mae = float(np.abs(a.mel - b.mel).mean())
    print(f"cloned mel |mel| mean {mel_scale:.3f}; "
          f"MAE from 5% token flips {mel_mae:.4f} "
          f"({100*mel_mae/mel_scale:.1f}%)")


if __name__ == "__main__":
    main()
