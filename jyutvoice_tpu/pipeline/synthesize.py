"""End-to-end synthesis pipeline: text -> token ids -> mel -> waveform.

The TPU-native analog of the reference's infer.py main path
(infer.py:271-446 + jyutvoice_tts.py:108-253 + generator.py:450-466):

  * host: g2p + intersperse (pure python),
  * device, compile-cached per length bucket:
      phase 1  — duration graph (encoder + DP) -> required mel frames,
      phase 2  — full mel graph (encoder -> durations -> expand -> prompt
                 graft -> CFM Euler) at the (text, mel, prompt) bucket,
      phase 3  — HiFT vocoder at the mel bucket.

Compilation happens once per bucket tuple; subsequent calls reuse the cache.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models import duration as dur_mod
from jyutvoice_tpu.models import hift as hift_mod
from jyutvoice_tpu.models import text_encoder as te_mod
from jyutvoice_tpu.models import tts as tts_mod
from jyutvoice_tpu.pipeline import buckets as bkt
from jyutvoice_tpu.text import intersperse, text_to_sequence
from jyutvoice_tpu.weights.noise import rand_noise


def long_frame_granule(n_seq: int) -> int:
    """Mel-frame granule for the one-pass long-form decode: multiples of it
    keep the jit shape table small AND are divisible by any seq-mesh size
    (lcm, not max — a granule of 32 fails e.g. n_seq=6: 128 % 6 != 0)."""
    return math.lcm(32, n_seq) if n_seq > 1 else 32


class OverLongBatchItems(ValueError):
    """Raised by synthesize_batch_dispatch when specific items need more
    mel frames than the batch bucket table allows. `indices` lists the
    culprit positions in the passed items list so a server can fail only
    those requests and re-dispatch the innocent rest."""

    def __init__(self, msg: str, indices):
        super().__init__(msg)
        self.indices = tuple(indices)


class NoiseBufferExceeded(ValueError):
    """Raised by synthesize_batch_dispatch when the batch's prompt bucket +
    mel bucket exceed the deterministic noise buffer. A GROUP property (the
    mel bucket comes from the longest co-batched item), so a server catches
    this TYPE to fail only the prompt-bearing culprits and retry the rest —
    never match on the message text."""


@dataclasses.dataclass
class SynthesisResult:
    wav: np.ndarray  # (num_samples,) float32 at 24 kHz
    mel: np.ndarray  # (T_mel, 80)
    mel_frames: int
    rtf: float  # wall-clock real-time factor (reference jyutvoice_tts.py:243)
    timings: Dict[str, float]


class Synthesizer:
    """Holds params + per-bucket jit caches.

    params_tts / params_hift are pytrees from the weights layer (converted
    checkpoints) or random init (for benchmarking).
    """

    def __init__(
        self,
        cfg: JyutVoiceConfig,
        params_tts,
        params_hift,
        *,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.params_tts = params_tts
        self.params_hift = params_hift
        self.dtype = dtype
        self.noise = jnp.asarray(rand_noise())
        self._dur_fns: Dict[int, callable] = {}
        self._mel_fns: Dict[Tuple, callable] = {}
        self._voc_fns: Dict[int, callable] = {}

    # ---------------- device graphs ----------------

    def _dur_fn(self, t_text: int):
        if t_text not in self._dur_fns:
            cfg = self.cfg.tts

            @jax.jit
            def f(params, x, x_lengths, lang, tone, word_pos, syllable_pos, spk):
                enc = te_mod.apply_text_encoder(
                    params["encoder"], cfg.encoder, x, x_lengths, lang, tone,
                    word_pos, syllable_pos, spk,
                )
                logw = dur_mod.apply_duration_predictor(
                    params["dp"], cfg.dp, enc.x, enc.x_mask, spk
                )
                w_ceil = jnp.ceil(jnp.exp(logw) * enc.x_mask)
                return jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1.0)

            self._dur_fns[t_text] = f
        return self._dur_fns[t_text]

    def _mel_fn(self, key: Tuple[int, int, int, int]):
        if key not in self._mel_fns:
            t_text, t_mel, t_prompt, n_steps = key
            cfg = self.cfg.tts

            # length_scale is TRACED (synthesize_mel only uses it
            # arithmetically): a static argname here would recompile the
            # largest graph for every distinct per-call value
            @jax.jit
            def f(params, noise, x, x_lengths, lang, tone, word_pos,
                  syllable_pos, spk, prompt_feat, prompt_h, prompt_lengths,
                  length_scale):
                return tts_mod.synthesize_mel(
                    params, cfg, x, x_lengths, lang, tone, word_pos,
                    syllable_pos, spk, prompt_feat, prompt_h, prompt_lengths,
                    t_mel_max=t_mel, n_timesteps=n_steps, rand_noise=noise,
                    length_scale=length_scale,
                )

            self._mel_fns[key] = f
        return self._mel_fns[key]

    def _voc_fn(self, t_mel: int, pcm16: bool = False):
        key = (t_mel, pcm16)
        if key not in self._voc_fns:
            hift_cfg = self.cfg.hift

            @jax.jit
            def f(params, mel):
                # auto-windows batch-1 long-form mels (1.7x at T=12288)
                wav, _ = hift_mod.hift_vocode_auto(
                    params, hift_cfg, mel, deterministic=True
                )
                if pcm16:
                    # on-device PCM16: halves the host-readback bytes (the
                    # dominant serving cost over a tunneled link) and is the
                    # wav-file-native format anyway. hift already clips to
                    # +/-audio_limit (0.99); the clip here makes int16
                    # range-safety independent of that invariant.
                    wav = jnp.round(
                        jnp.clip(wav, -1.0, 1.0) * 32767.0
                    ).astype(jnp.int16)
                return wav

            self._voc_fns[key] = f
        return self._voc_fns[key]

    def _fused_fn(self, key: Tuple[int, int, int, int]):
        """mel graph + vocoder in ONE compiled call (single dispatch)."""
        fkey = ("fused",) + key
        if fkey not in self._mel_fns:
            t_text, t_mel, t_prompt, n_steps = key
            cfg = self.cfg.tts
            hift_cfg = self.cfg.hift

            # length_scale traced — see _mel_fn
            @jax.jit
            def f(params, params_hift, noise, x, x_lengths, lang, tone,
                  word_pos, syllable_pos, spk, prompt_feat, prompt_h,
                  prompt_lengths, length_scale):
                out = tts_mod.synthesize_mel(
                    params, cfg, x, x_lengths, lang, tone, word_pos,
                    syllable_pos, spk, prompt_feat, prompt_h, prompt_lengths,
                    t_mel_max=t_mel, n_timesteps=n_steps, rand_noise=noise,
                    length_scale=length_scale,
                )
                wav, _ = hift_mod.hift_vocode_auto(
                    params_hift, hift_cfg, out.mel, deterministic=True
                )
                return wav, out.mel, out.mel_lengths

            self._mel_fns[fkey] = f
        return self._mel_fns[fkey]

    def warmup(
        self,
        text_buckets=None,
        mel_buckets=None,
        prompt_buckets=(0,),
        n_timesteps=(10,),
        batch_sizes=(1,),
        pcm16: bool = False,
        log_fn=None,
    ) -> int:
        """Pre-compile the bucketed serving graphs before traffic arrives.

        Every (text, mel, prompt, steps, batch) shape is its own XLA
        compile — minutes each on a cold process (first-conv autotune), so
        a fresh deployment otherwise pays that on its first unlucky
        request. Driving each combination once here moves the cost to
        startup and populates the persistent compilation cache, after
        which warmup itself is seconds. batch_sizes follows the serving
        engine's power-of-two padding (synthesize_batch_dispatch): warm
        (1, 2, 4, 8) to cover max_batch=8. batch 1 warms BOTH graph
        families — the fused single-dispatch graph the direct
        synthesize() path uses AND the engine's mel+vocoder pair (a
        singleton serving group dispatches through the latter at
        b_pad=1, a different XLA program); larger batches warm the
        mel+vocoder pair only.

        Defaults cover the common interactive envelope (short sentences,
        no cloning prompt): text <= 128 tokens, mel <= 1024 frames (~20 s).
        Returns the number of graphs driven.
        """
        tb = tuple(text_buckets) if text_buckets else bkt.TEXT_BUCKETS[:4]
        mb = tuple(mel_buckets) if mel_buckets else bkt.MEL_BUCKETS[:6]
        count = 0
        wav = None
        for b in sorted({int(v) for v in batch_sizes}):
            spk = jnp.zeros((b, self.cfg.tts.spk_embed_dim), self.dtype)
            ones = jnp.ones((b,), jnp.int32)
            for t_text in tb:
                x = jnp.zeros((b, t_text), jnp.int32)
                self._dur_fn(t_text)(
                    self.params_tts, x, ones, x, x, x, x, spk
                )
                count += 1
                for t_mel in mb:
                    for t_prompt in prompt_buckets:
                        pf = jnp.zeros((b, t_prompt, 80), jnp.float32)
                        plen = jnp.zeros((b,), jnp.int32)
                        noise = self.noise
                        if t_prompt + t_mel > noise.shape[1]:
                            # mirror synthesize(): combos past the 300 s
                            # buffer run on the extended noise at runtime —
                            # warming with the base buffer would crash in
                            # the trace (broadcast shape error) AND warm
                            # the wrong input shape
                            from jyutvoice_tpu.weights.noise import (
                                rand_noise_extended,
                            )

                            noise = jnp.asarray(
                                rand_noise_extended(t_prompt + t_mel)
                            )
                        for steps in n_timesteps:
                            key = (t_text, t_mel, t_prompt, int(steps))
                            if log_fn:
                                log_fn(f"warmup b={b} {key}")
                            if b == 1:
                                wav, _, _ = self._fused_fn(key)(
                                    self.params_tts, self.params_hift,
                                    noise, x, ones, x, x, x, x, spk,
                                    pf, pf, plen,
                                    length_scale=jnp.float32(1.0),
                                )
                                count += 1
                            # the engine path dispatches EVERY group —
                            # including singletons at b_pad=1 — through
                            # the mel+vocoder pair, a different XLA
                            # program from the fused graph: warm it at
                            # every batch size
                            out = self._mel_fn(key)(
                                self.params_tts, noise, x, ones,
                                x, x, x, x, spk, pf, pf, plen,
                                length_scale=jnp.float32(1.0),
                            )
                            wav = self._voc_fn(t_mel, pcm16)(
                                self.params_hift, out.mel
                            )
                            count += 2  # mel + vocoder: two XLA programs
        if wav is not None:
            # one honest fence (readback; block_until_ready lies over the
            # tunneled platform) so warmup returns only once the device has
            # actually executed the last graph
            np.asarray(wav)
        return count

    # ---------------- host API ----------------

    def prepare_text(self, text: str, lang: str, phone: Optional[str] = None):
        """g2p + blank interspersal -> padded int arrays (1, T_bucket)."""
        ids, tones, word_pos, syllable_pos, lang_ids = text_to_sequence(
            text, lang=lang, phone=phone
        )
        seqs = [intersperse(s, 0) for s in (ids, tones, word_pos, syllable_pos, lang_ids)]
        n = len(seqs[0])
        t_text = bkt.pick_bucket(n, bkt.TEXT_BUCKETS)
        arrs = []
        for s in seqs:
            a = np.zeros((1, t_text), np.int32)
            a[0, :n] = s
            # host arrays: jit converts them at dispatch. Returning device
            # arrays here cost synthesize_batch a tunnel round-trip PER
            # FEATURE PER ITEM to read them back (40 RTTs per batch-8 group)
            arrs.append(a)
        return arrs, np.array([n], np.int32), t_text

    def synthesize(
        self,
        text: str,
        lang: str = "yue",
        phone: Optional[str] = None,
        spk_embed: Optional[np.ndarray] = None,
        prompt_feat: Optional[np.ndarray] = None,  # (T_p, 80)
        prompt_h: Optional[np.ndarray] = None,  # (T_p, 80)
        n_timesteps: int = 10,
        length_scale: float = 1.0,
        fused: bool = True,
    ) -> SynthesisResult:
        t0 = time.perf_counter()
        (x, tone, word_pos, syllable_pos, lang_ids), n, t_text = self.prepare_text(
            text, lang, phone
        )
        x_lengths = jnp.asarray(n)
        if spk_embed is None:
            spk = jnp.zeros((1, self.cfg.tts.spk_embed_dim), self.dtype)
        else:
            spk = jnp.asarray(spk_embed.reshape(1, -1), self.dtype)

        # phase 1: required mel frames
        y_len = int(
            self._dur_fn(t_text)(
                self.params_tts, x, x_lengths, lang_ids, tone, word_pos,
                syllable_pos, spk,
            )[0]
        )
        y_len = int(np.ceil(y_len * length_scale))
        # prompt-pair validation FIRST: fail fast with the same error on
        # every path (streaming._init_session raises on the same mistake)
        # before any device work — the long-form delegation below forwards
        # the pair, but a half-given pair must never reach it
        if (prompt_feat is None) != (prompt_h is None):
            raise ValueError(
                "voice cloning needs BOTH prompt_feat and prompt_h "
                "(PromptExtractor returns the pair); got only one"
            )
        if y_len > bkt.MEL_BUCKETS[-1]:
            # past the bucket table (the reference's 300 s cap): the
            # one-pass long-form path has no such cap (extended noise,
            # flash attention, windowed vocoder) — delegate instead of
            # raising. Cloning prompts graft into the long path's fixed
            # 512-frame head region (round 4).
            return self.synthesize_long(
                text, lang=lang, phone=phone, spk_embed=spk_embed,
                prompt_feat=prompt_feat, prompt_h=prompt_h,
                n_timesteps=n_timesteps, length_scale=length_scale,
                # reuse this call's g2p output — re-running prepare_text on
                # a multi-minute text doubles the frontend host work
                prepped=(
                    (x, tone, word_pos, syllable_pos, lang_ids), n, t_text
                ),
            )
        t_mel = bkt.pick_bucket(max(y_len, 1), bkt.MEL_BUCKETS)

        # prompt padding
        if prompt_feat is not None and prompt_h is not None:
            p_len = prompt_feat.shape[0]
            t_prompt = bkt.pick_prompt_bucket(p_len, t_mel)
            pf = np.zeros((1, t_prompt, 80), np.float32)
            ph = np.zeros((1, t_prompt, 80), np.float32)
            pf[0, :p_len] = prompt_feat
            ph[0, :p_len] = prompt_h
            plen = np.array([p_len], np.int32)
        else:
            t_prompt = 0
            pf = np.zeros((1, 0, 80), np.float32)
            ph = np.zeros((1, 0, 80), np.float32)
            plen = np.array([0], np.int32)

        noise = self.noise
        if t_prompt + t_mel > noise.shape[1]:
            # past the reference's fixed 300 s buffer (flow_matching.py:354)
            # — e.g. a cloning prompt pushing a near-cap utterance over —
            # extend deterministically (weights/noise.py: bit-identical for
            # the first 15000 frames, PRNG-extended beyond)
            from jyutvoice_tpu.weights.noise import rand_noise_extended

            noise = jnp.asarray(rand_noise_extended(t_prompt + t_mel))
        t1 = time.perf_counter()
        key = (t_text, t_mel, t_prompt, n_timesteps)
        if fused:
            wav, mel, mel_lengths = self._fused_fn(key)(
                self.params_tts, self.params_hift, noise, x, x_lengths,
                lang_ids, tone, word_pos, syllable_pos, spk, jnp.asarray(pf),
                jnp.asarray(ph), jnp.asarray(plen),
                length_scale=jnp.float32(length_scale),
            )
            # ONE combined host fetch (wav + mel + lengths): each separate
            # np.asarray/int() of a device array costs a full ~28 ms tunnel
            # RTT (CLAUDE.md transport rules), and on the tunneled axon
            # platform only the readback is an honest execution fence
            wav, mel, mel_lengths = jax.device_get((wav, mel, mel_lengths))
            mel_frames = int(mel_lengths[0])
            t2 = t3 = time.perf_counter()
        else:
            out = self._mel_fn(key)(
                self.params_tts, noise, x, x_lengths, lang_ids, tone,
                word_pos, syllable_pos, spk, jnp.asarray(pf), jnp.asarray(ph),
                jnp.asarray(plen), length_scale=jnp.float32(length_scale),
            )
            # small-array fence (4 bytes): closes the mel stage for an
            # honest timing split; the BIG arrays (wav + mel) ride one
            # combined device_get below instead of two separate ~28 ms-RTT
            # readbacks (CLAUDE.md transport rules)
            mel_frames = int(out.mel_lengths[0])
            t2 = time.perf_counter()
            wav = self._voc_fn(t_mel)(self.params_hift, out.mel)
            wav, mel = jax.device_get((wav, out.mel))
            t3 = time.perf_counter()

        num_samples = mel_frames * self.cfg.audio.hop_length
        wav_np = np.asarray(wav)[0, :num_samples]
        mel_np = np.asarray(mel)[0, :mel_frames]
        elapsed = t3 - t0
        audio_seconds = num_samples / self.cfg.audio.sample_rate
        return SynthesisResult(
            wav=wav_np,
            mel=mel_np,
            mel_frames=mel_frames,
            rtf=elapsed / max(audio_seconds, 1e-9),
            timings={
                "frontend_and_duration": t1 - t0,
                "mel": t2 - t1,
                "vocoder": t3 - t2,
                "total": elapsed,
                "audio_seconds": audio_seconds,
            },
        )

    def prepare_stream(
        self,
        text: str,
        lang: str = "yue",
        phone: Optional[str] = None,
        spk_embed: Optional[np.ndarray] = None,
        length_scale: float = 1.0,
        prepped=None,
    ):
        """Text half for streaming: encoder + durations in one bucketed-jit
        dispatch, duration->frame expansion on host. Returns
        (mu_y (T,80), c (80,), y_len) — the inputs a Streaming/MultiStream
        synthesizer session consumes. prepped= reuses a cached prepare_text
        result (skips g2p)."""

        (x, tone, word_pos, syllable_pos, lang_ids), n, t_text = (
            prepped if prepped is not None
            else self.prepare_text(text, lang, phone)
        )
        if spk_embed is None:
            spk_raw = jnp.zeros((1, self.cfg.tts.spk_embed_dim), self.dtype)
        else:
            spk_raw = jnp.asarray(spk_embed.reshape(1, -1), self.dtype)

        # text encoder + durations in ONE bucketed dispatch (the eager form
        # cost dozens of per-op tunnel dispatches before the first chunk
        # could start); the duration->frame expansion happens on HOST.
        # generate_path (nn/core.py:512) is a pure cumsum-threshold: frame j
        # belongs to token i iff cum[i-1] <= j < cum[i], which is exactly
        # np.searchsorted(cum, j, side="right") — so expanding here avoids a
        # second device dispatch (~28 ms tunnel RTT), the full padded
        # (1, t_mel, 80) mu_y readback (4.8 MB at the 15000 bucket vs the
        # (t_text, 80) mu), and an unbounded per-(t_text, t_mel) jit-graph
        # family for past-table lengths.
        w_ceil, mu, _, c = self._stream_enc_fn(t_text)(
            self.params_tts, x, jnp.asarray(n), lang_ids, tone, word_pos,
            syllable_pos, spk_raw, jnp.float32(length_scale),
        )
        w_np, mu_np, c_np = jax.device_get((w_ceil, mu, c))
        y_len = int(max(w_np.sum(), 1.0))
        # masked text rows carry w=0 (w_ceil = ceil(exp(logw)*x_mask)*ls) so
        # the flat cumsum tail never claims a frame. f64 accumulation: the
        # device generate_path cumsum is an f32 log-depth scan, so at a
        # fractional length_scale a partial sum within 1 ULP of an integer
        # could land a boundary frame on either side — f64 pins the host
        # boundaries to the exact real-arithmetic ones (a residual 1-frame
        # tie vs the device path is possible only when the f32 scan itself
        # misrounds across an integer, inherent to the f32 device path)
        cum = np.cumsum(w_np[0, :, 0], dtype=np.float64)
        idx = np.searchsorted(
            cum, np.arange(y_len, dtype=np.float64), side="right"
        )
        mu_t = mu_np[0].astype(np.float32, copy=False)
        mu_y = np.zeros((y_len, mu_t.shape[1]), np.float32)
        valid = idx < mu_t.shape[0]  # y_len=1 on empty durations -> zero row
        mu_y[valid] = mu_t[idx[valid]]
        return mu_y, c_np[0], y_len

    def synthesize_streaming(
        self,
        text: str,
        lang: str = "yue",
        phone: Optional[str] = None,
        spk_embed: Optional[np.ndarray] = None,
        prompt_feat: Optional[np.ndarray] = None,
        prompt_h: Optional[np.ndarray] = None,
        chunk_frames: int = 100,
        length_scale: float = 1.0,
        n_timesteps: int = 10,
    ):
        """Generator of 24 kHz waveform chunks (chunk_frames*480 samples).

        Text half runs once up front (cheap); the CFM decoder + vocoder
        stream with overlap caches (pipeline/streaming.py). First chunk
        latency ~ one chunk decode instead of the whole utterance.
        """
        from jyutvoice_tpu.pipeline.streaming import StreamingSynthesizer

        mu_y, c, y_len = self.prepare_stream(
            text, lang=lang, phone=phone, spk_embed=spk_embed,
            length_scale=length_scale,
        )
        p_len = 0 if prompt_feat is None else prompt_feat.shape[0]
        # BUCKET the prompt length: the chunk graph's segment is
        # prompt_frames + OVERLAP + chunk, so keying on the raw p_len would
        # recompile the 10-step CFM + vocoder graph (minutes on this
        # platform) for every distinct cloning prompt and leak one
        # synthesizer per length. stream() right-aligns shorter prompts in
        # the bucket and masks the unused prefix.
        p_cap = bkt.pick_bucket(p_len, bkt.PROMPT_BUCKETS[1:]) if p_len else 0
        # cache the streaming synthesizer: a fresh instance per call would
        # re-create its jit wrapper and re-trace the fused chunk graph
        # every utterance (measured seconds per call)
        skey = ("stream_ss", chunk_frames, p_cap, n_timesteps)
        if skey not in self._mel_fns:
            self._mel_fns[skey] = StreamingSynthesizer(
                self.cfg, self.params_tts, self.params_hift,
                chunk_frames=chunk_frames, prompt_frames=p_cap,
                n_timesteps=n_timesteps,
            )
        ss = self._mel_fns[skey]
        total = 0
        for chunk in ss.stream(mu_y, c, prompt_feat, prompt_h):
            emit = min(len(chunk), y_len * self.cfg.hift.total_upsample - total)
            if emit <= 0:
                break
            yield chunk[:emit]
            total += emit

    def _long_solve_fn(self, t_mel: int, n_timesteps: int,
                       attention: str = "auto"):
        """Single-device long-form CFM solve graph, cached per shape.

        attention="banded" swaps the estimator to the linear chunk-band
        backend (nn/attention.py::banded_sdpa) — an opt-in approximation
        for very long decodes (docs/design.md round-4 section); "auto"
        keeps the configured backend (stock-flash gate at 512-aligned
        T >= 2048)."""
        key = ("long_solve", t_mel, n_timesteps, attention)
        if key not in self._mel_fns:
            import dataclasses

            cfm_cfg = self.cfg.tts.cfm
            if attention == "banded":
                cfm_cfg = dataclasses.replace(
                    cfm_cfg,
                    estimator=dataclasses.replace(
                        cfm_cfg.estimator, attention_backend="banded"
                    ),
                )
            elif attention == "exact":
                # force full attention past banded_long_threshold (flash
                # gate stays — it is numerically equivalent)
                cfm_cfg = dataclasses.replace(
                    cfm_cfg,
                    estimator=dataclasses.replace(
                        cfm_cfg.estimator, banded_long_threshold=0
                    ),
                )
            elif attention != "auto":
                raise ValueError(
                    f"unknown long-form attention {attention!r} "
                    "(use 'auto', 'banded' or 'exact')"
                )

            @jax.jit
            def solve(dec, mu, mask, spks, cond, noise):
                from jyutvoice_tpu.models.cfm import cfm_forward

                return cfm_forward(
                    dec, cfm_cfg, mu, mask, spks, cond,
                    n_timesteps=n_timesteps, rand_noise=noise,
                )

            self._mel_fns[key] = solve
        return self._mel_fns[key]

    def _long_strip_fn(self, t_total: int, t_out: int):
        """Prompt strip for the long-form path: traced start (p_len <=
        p_bucket = t_total - t_out keeps the slice in bounds), static size.
        Cached per shape pair."""
        key = ("long_strip", t_total, t_out)
        if key not in self._mel_fns:

            @jax.jit
            def strip(mel, p_len):
                return jax.lax.dynamic_slice(
                    mel, (0, p_len, 0), (1, t_out, mel.shape[-1])
                )

            self._mel_fns[key] = strip
        return self._mel_fns[key]

    def _long_sp_fn(self, mesh, n_timesteps: int, sp_attention: str):
        """Sequence-parallel long-form solve, cached per (mesh, steps,
        attention): (run, decoder-params device_put with SP shardings)."""
        from jyutvoice_tpu.dist.sp import sp_cfm_solve, sp_param_shardings

        # key on the Mesh OBJECT (hashable, compared by devices+axes): an
        # id() key can collide after the original mesh is garbage-collected
        # and silently serve a solver bound to a dead mesh. The decoder
        # device placement depends only on the mesh, so it is cached
        # separately — warming several step counts shares ONE device copy
        # instead of duplicating decoder HBM per (steps, attention).
        dec_key = ("long_sp_dec", mesh)
        if dec_key not in self._mel_fns:
            self._mel_fns[dec_key] = jax.device_put(
                self.params_tts["decoder"],
                sp_param_shardings(self.params_tts["decoder"], mesh),
            )
        key = ("long_sp", mesh, n_timesteps, sp_attention)
        if key not in self._mel_fns:
            self._mel_fns[key] = sp_cfm_solve(
                self.params_tts["decoder"], self.cfg.tts.cfm, mesh,
                n_timesteps=n_timesteps, attention=sp_attention,
            )
        return self._mel_fns[key], self._mel_fns[dec_key]

    def warmup_long(
        self,
        # the full long-form shape table synthesize_long actually picks:
        # every 512-aligned mel bucket >= 2048 (the 15000 cap 512-rounds
        # into the 12288-15360 window, warmed on demand)
        mel_sizes=(2048, 3072, 4096, 6144, 8192, 12288),
        text_buckets=(1024, 2048, 4096, 8192),
        n_timesteps=(10,),
        pcm16: bool = False,
        log_fn=None,
        mesh=None,
        sp_attention: str = "scores",
        with_prompt: bool = False,
        attention: str = "auto",
    ) -> int:
        """Pre-compile the long-form (synthesize_long) graph family.

        A cold first long request pays ~90 s of compiles (measured: text
        encoder at an 8192-token bucket, the flash-path solve at the
        512-rounded mel shape, the windowed vocoder). Driving each graph
        once here moves that to startup and fills the persistent compile
        cache. mel_sizes should be 512-multiples (synthesize_long rounds
        its shape table to 512 past T=1536, lcm-extended for odd mesh
        sizes). With mesh/sp_attention the solve graphs warmed are the
        sequence-parallel ones that synthesize_long(mesh=...) will pick
        (the default 512-multiples are valid for any power-of-2 mesh).
        with_prompt=True additionally warms the cloning variants: the
        solve at p_bucket + t_mel (512-frame prompt head), the strip
        graph, and the t_mel vocoder — the shapes
        synthesize_long(prompt_feat=...) picks. Returns graphs driven.
        attention selects the single-device solve variant to warm
        ("auto"/"exact"/"banded") — it must match the engine's
        long_attention flag or the warmed _long_solve_fn keys miss and
        the first served long request pays the cold compile anyway.
        """

        from jyutvoice_tpu.weights.noise import rand_noise_extended

        if mesh is not None:
            from jyutvoice_tpu.dist.sp import SEQ_AXIS

            n_seq = mesh.shape[SEQ_AXIS]
            granule = long_frame_granule(n_seq)
            align = math.lcm(512, n_seq)
            # validate BEFORE compiling anything: each text bucket costs
            # minutes cold, and a bad mel table would waste them all
            bad = [
                t for t in mel_sizes
                if t % granule or (t > 1536 and t % align)
            ]
            if bad:
                raise ValueError(
                    f"mel_sizes {bad} not divisible by the mesh's frame "
                    f"granule ({granule}; 512-aligned past 1536) — "
                    f"synthesize_long(mesh=...) would never pick them"
                )
        count = 0
        ones = jnp.ones((1,), jnp.int32)
        spk = jnp.zeros((1, self.cfg.tts.spk_embed_dim), self.dtype)
        for t_text in text_buckets:
            x = jnp.zeros((1, t_text), jnp.int32)
            out = self._stream_enc_fn(t_text)(
                self.params_tts, x, ones, x, x, x, x, spk, jnp.float32(1.0)
            )
            jax.block_until_ready(out)
            count += 1
            if log_fn:
                log_fn(f"warmup_long: text bucket {t_text} ready")
        spks = jnp.zeros((1, 80), jnp.float32)
        if mesh is not None:
            from jyutvoice_tpu.dist.sp import seq_sharding
        p_bucket = 0
        if with_prompt:
            n_seq = 1
            if mesh is not None:
                from jyutvoice_tpu.dist.sp import SEQ_AXIS

                n_seq = mesh.shape[SEQ_AXIS]
            p_bucket = math.lcm(512, long_frame_granule(n_seq))
        for t_mel in mel_sizes:
            jobs = [(t_mel, 0)]
            if with_prompt:
                jobs.append((p_bucket + t_mel, p_bucket))
            for t_total, head in jobs:
                mu = jnp.zeros((1, t_total, 80), jnp.float32)
                mask = jnp.ones((1, t_total, 1), jnp.float32)
                cond = jnp.zeros((1, t_total, 80), jnp.float32)
                noise = jnp.asarray(rand_noise_extended(t_total))
                for steps in n_timesteps:
                    if mesh is None:
                        mel = self._long_solve_fn(t_total, steps, attention)(
                            self.params_tts["decoder"], mu, mask, spks, cond,
                            noise,
                        )
                    else:
                        run, dec = self._long_sp_fn(mesh, steps, sp_attention)
                        seq = seq_sharding(mesh)
                        mel = run(
                            dec,
                            jax.device_put(mu, seq),
                            jax.device_put(mask, seq),
                            spks,
                            jax.device_put(cond, seq),
                            noise,
                        )
                        mel = jax.device_put(mel, jax.devices()[0])
                    if head:
                        mel = self._long_strip_fn(t_total, t_mel)(
                            mel, jnp.int32(head)
                        )
                    wav = self._voc_fn(t_mel, pcm16)(self.params_hift, mel)
                    jax.block_until_ready(wav)
                    count += 1
                    if log_fn:
                        log_fn(
                            f"warmup_long: mel {t_mel}"
                            + (f" +prompt{head}" if head else "")
                            + f" x {steps} steps ready"
                        )
        return count

    def _stream_enc_fn(self, t_text: int):
        """Streaming/long text-half graph (encoder + durations + spk
        affine), cached per text bucket; shared by prepare_stream and
        warmup_long."""

        from jyutvoice_tpu.models import duration as dur_mod
        from jyutvoice_tpu.models import text_encoder as te_mod
        from jyutvoice_tpu.models.tts import _l2_normalize
        from jyutvoice_tpu.nn import core

        cfg = self.cfg.tts
        key_enc = ("stream_enc", t_text)
        if key_enc not in self._mel_fns:

            @jax.jit
            def enc_fn(params, x, n, lang, tone, wp, sp, spk_raw, ls):
                enc = te_mod.apply_text_encoder(
                    params["encoder"], cfg.encoder, x, n, lang, tone, wp, sp,
                    spk_raw,
                )
                logw = dur_mod.apply_duration_predictor(
                    params["dp"], cfg.dp, enc.x, enc.x_mask, spk_raw
                )
                w_ceil = jnp.ceil(jnp.exp(logw) * enc.x_mask) * ls
                c = _l2_normalize(spk_raw, axis=1)
                c = core.linear(params["spk_embed_affine_layer"], c)
                return w_ceil, enc.mu, enc.x_mask, c

            self._mel_fns[key_enc] = enc_fn
        return self._mel_fns[key_enc]

    def synthesize_long(
        self,
        text: str,
        lang: str = "yue",
        phone: Optional[str] = None,
        spk_embed: Optional[np.ndarray] = None,
        prompt_feat: Optional[np.ndarray] = None,  # (T_p, 80)
        prompt_h: Optional[np.ndarray] = None,  # (T_p, 80)
        mesh=None,
        n_timesteps: int = 10,
        length_scale: float = 1.0,
        sp_attention: str = "scores",
        attention: str = "auto",
        pcm16: bool = False,
        dequantize: bool = True,
        return_mel: bool = True,
        prepped=None,
    ) -> SynthesisResult:
        """One-pass long-form synthesis, optionally sequence-parallel.

        attention (single-device path): "auto" = the configured backend
        (flash below banded_long_threshold, the linear chunk-band past
        it — the measured default); "banded" = force the chunk-band at
        any length; "exact" = force full attention even past the
        threshold (flash stays — numerically equivalent). Divergence and
        speedups in docs/design.md round 4.

        With `mesh` (a jax.sharding.Mesh with a "seq" axis — dist/sp.py),
        the CFM decode shards the sequence axis across the mesh: per-chip
        attention memory/FLOPs drop n_seq-fold, so utterances past the
        single-chip quadratic-attention wall decode in ONE Euler solve
        instead of chunked streaming. mesh=None runs the same path on one
        device (still removes the 15000-frame noise-buffer cap via the
        deterministic extended stream, weights/noise.py). The vocoder is
        linear in T and stays single-device.

        Voice cloning: prompt_feat/prompt_h (the PromptExtractor pair,
        reference jyutvoice_tts.py:213-229 graft semantics) condition the
        whole decode. The prompt grafts FRONT-ALIGNED into a fixed
        512-frame head region (prompt_h into mu, prompt_feat into conds,
        valid region = contiguous prefix), so the attention mask stays a
        suffix-length mask — the stock-flash / ring attention paths remain
        eligible (a right-aligned graft would front-pad the mask and force
        the slow score path, CLAUDE.md mask-semantics rule). The generated
        region is stripped on device with a traced-start static-size slice
        before vocoding.

        sp_attention (mesh only): "scores" = GSPMD dense path (per-chip
        score memory (2B,H,T/n,T)); "ring" = ring attention
        (dist/ring.py, per-chip tile (2B,H,T/n,T/n)) for decodes past even
        the SP dense memory wall; "banded" = the linear chunk-band,
        sharded (per-chip (2B,H,T/n,w) — approximate, docs/design.md
        round 4).

        pcm16=True converts the wav to int16 ON DEVICE and dequantizes on
        host: halves the dominant long-form readback bytes over a
        tunnel-attached chip at 16-bit audio precision (wav files are
        16-bit anyway). dequantize=False keeps the raw int16 (serving
        transport); return_mel=False skips the mel readback (~4 MB at
        240 s over the tunnel); prepped= reuses a cached prepare_text
        result (the serving engine validates the frontend per request).
        """

        from jyutvoice_tpu.weights.noise import rand_noise_extended

        t0 = time.perf_counter()
        if attention not in ("auto", "banded", "exact"):
            raise ValueError(
                f"unknown long-form attention {attention!r} "
                "(use 'auto', 'banded' or 'exact')"
            )
        if attention != "auto" and mesh is not None:
            raise ValueError(
                f"attention={attention!r} is the single-device long-form "
                "control; sharded decodes pick sp_attention instead"
            )
        n_seq = 1
        if mesh is not None:
            from jyutvoice_tpu.dist.sp import SEQ_AXIS

            n_seq = mesh.shape[SEQ_AXIS]
        granule = long_frame_granule(n_seq)

        if (prompt_feat is None) != (prompt_h is None):
            raise ValueError(
                "voice cloning needs BOTH prompt_feat and prompt_h "
                "(PromptExtractor returns the pair); got only one"
            )
        p_len = 0
        p_bucket = 0
        if prompt_feat is not None:
            prompt_feat = np.asarray(prompt_feat, np.float32)
            prompt_h = np.asarray(prompt_h, np.float32)
            for name, arr in (("prompt_feat", prompt_feat), ("prompt_h", prompt_h)):
                if arr.ndim != 2 or arr.shape[1] != 80:
                    raise ValueError(f"{name} must be (T_p, 80), got {arr.shape}")
            p_len = int(prompt_feat.shape[0])
            if prompt_h.shape[0] != p_len:
                raise ValueError(
                    f"prompt_feat/prompt_h lengths differ: {p_len} vs "
                    f"{prompt_h.shape[0]}"
                )
            if p_len > bkt.PROMPT_BUCKETS[-1]:
                raise ValueError(
                    f"cloning prompt is {p_len} mel frames — past the largest "
                    f"prompt bucket {bkt.PROMPT_BUCKETS[-1]} (~"
                    f"{bkt.PROMPT_BUCKETS[-1] * self.cfg.audio.hop_length / self.cfg.audio.sample_rate:.0f} s); "
                    "trim the reference audio"
                )
            # fixed head region: 512 keeps prompt+mel totals on the same
            # 512-grid as promptless long-form (flash-eligible, shared
            # graph family); lcm-extended so odd seq meshes still shard
            p_bucket = math.lcm(512, granule)

        mu_y, c, y_len = self.prepare_stream(
            text, lang=lang, phone=phone, spk_embed=spk_embed,
            length_scale=length_scale, prepped=prepped,
        )
        # 512-align the long-form shape table on EVERY path: single-device
        # decodes hit the stock-flash attention gate
        # (models/estimator.py::use_stock_flash, 1.6-1.75x) only at
        # 512-aligned totals (smaller flash blocks measured 0.29-0.92x),
        # and the sharded path needs a BOUNDED graph family that
        # warmup_long(mesh=...) can pre-compile — one compile per
        # 512-granule (lcm-extended for odd mesh sizes), never one per
        # 32-frame request length
        align = 512 if n_seq == 1 else math.lcm(512, n_seq)
        want = int(np.ceil(max(y_len, 1) / granule)) * granule
        if want > 1536:
            want = int(np.ceil(want / align)) * align
        if want <= bkt.MEL_BUCKETS[-1]:
            t_mel = bkt.pick_bucket(want, bkt.MEL_BUCKETS)
            if t_mel % granule or (t_mel % align and t_mel >= 2048):
                # bucket the mesh can't shard, or the 15000-frame cap (the
                # only non-512-aligned long bucket): use the aligned want
                # instead (flash-eligible on one chip, <= 6 shapes in the
                # 12288-15360 window; extended noise covers past 15000)
                t_mel = want
        else:
            t_mel = want
        if attention == "banded" and mesh is None:
            # the chunk-band framing needs T % banded_chunk == 0 (the
            # shape table's sub-1536 granule is 32); p_bucket is already
            # a 512-multiple
            bc = self.cfg.tts.cfm.estimator.banded_chunk
            t_mel = int(np.ceil(t_mel / bc)) * bc
        # total solve length: fixed prompt head + the mel shape table above
        # (p_bucket is a 512/granule multiple, so totals stay on the same
        # flash-eligible grid and the mesh still shards them)
        t_total = p_bucket + t_mel
        t1 = time.perf_counter()

        mu = np.zeros((1, t_total, 80), np.float32)
        cond = np.zeros((1, t_total, 80), np.float32)
        if p_len:
            mu[0, :p_len] = prompt_h
            cond[0, :p_len] = prompt_feat
        mu[0, p_len : p_len + y_len] = np.asarray(mu_y)[:y_len]
        valid = p_len + y_len
        mask = (np.arange(t_total) < valid).astype(np.float32)[None, :, None]
        spks = np.asarray(c, np.float32).reshape(1, -1)
        noise = jnp.asarray(rand_noise_extended(t_total))

        if mesh is None:
            mel = self._long_solve_fn(t_total, n_timesteps, attention)(
                self.params_tts["decoder"], jnp.asarray(mu),
                jnp.asarray(mask), jnp.asarray(spks), jnp.asarray(cond),
                noise,
            )
        else:
            from jyutvoice_tpu.dist.sp import seq_sharding

            run, dec = self._long_sp_fn(mesh, n_timesteps, sp_attention)
            seq = seq_sharding(mesh)
            mel = run(
                dec,
                jax.device_put(jnp.asarray(mu), seq),
                jax.device_put(jnp.asarray(mask), seq),
                jnp.asarray(spks),
                jax.device_put(jnp.asarray(cond), seq),
                noise,
            )
            mel = jax.device_put(mel, jax.devices()[0])  # gather for vocode
        if p_bucket:
            # strip the prompt region on device: generated frames start at
            # the TRACED p_len (contiguous graft), static size t_mel — one
            # cached graph per (t_total, t_mel), no per-p_len recompiles
            mel = self._long_strip_fn(t_total, t_mel)(
                mel, jnp.int32(p_len)
            )
        t2 = time.perf_counter()

        wav = self._voc_fn(t_mel, pcm16)(self.params_hift, mel)
        # ONE combined host fetch: long-form readback is transport-bound
        # (~23 MB f32 wav at ~15 MB/s tunnel for 240 s audio); pcm16=True
        # halves the wav bytes via the on-device int16 conversion, and
        # return_mel=False skips the mel bytes entirely
        if return_mel:
            wav_np, mel_np = jax.device_get((wav, mel))
        else:
            wav_np, mel_np = jax.device_get(wav), None
        if pcm16 and dequantize:
            wav_np = wav_np.astype(np.float32) / 32767.0
        t3 = time.perf_counter()

        num_samples = y_len * self.cfg.audio.hop_length
        audio_seconds = num_samples / self.cfg.audio.sample_rate
        elapsed = t3 - t0
        return SynthesisResult(
            wav=wav_np[0, :num_samples],
            mel=mel_np[0, :y_len] if return_mel else None,
            mel_frames=y_len,
            rtf=elapsed / max(audio_seconds, 1e-9),
            timings={
                "frontend_and_duration": t1 - t0,
                "mel": t2 - t1,
                "vocoder": t3 - t2,
                "total": elapsed,
                # same contract as synthesize(): callers reached via the
                # transparent long-text delegation read this key
                "audio_seconds": audio_seconds,
            },
        )

    def synthesize_batch_dispatch(
        self,
        items,
        n_timesteps: int = 10,
        length_scale: float = 1.0,
        return_mel: bool = True,
        pcm16: bool = False,
    ):
        """Dispatch batched long-form synthesis (BASELINE config 4); returns
        a zero-arg `finalize` that reads results back and builds the list of
        SynthesisResult. Dispatch/readback are split so a server can overlap
        group N's device compute with group N-1's host transfer
        (pipeline/server.py double-buffering).

        items: list of dicts with keys text/lang/phone and optional
        spk_embed/prompt_feat/prompt_h. All items share one compiled graph:
        text/mel/prompt lengths are padded to the max bucket of the batch,
        and the batch dim is padded to the next power of two (row 0
        repeated) so realized batch sizes map onto log2 many compiled
        graphs instead of one per size — essential under a dynamic-batching
        server where group sizes vary per window.
        Results drop the padding rows.
        """


        b_real = len(items)
        if b_real == 0:
            # a dynamic-batching window can close empty; give it an empty
            # result instead of an IndexError from the padding-row logic
            return lambda: []
        b_pad = 1 << max(b_real - 1, 0).bit_length()  # next power of two
        items = list(items) + [items[0]] * (b_pad - b_real)
        b = len(items)
        bad_pair = [
            i for i, it in enumerate(items[:b_real])
            if (it.get("prompt_feat") is None) != (it.get("prompt_h") is None)
            or (
                it.get("prompt_feat") is not None
                and len(it["prompt_feat"]) != len(it["prompt_h"])
            )
        ]
        if bad_pair:
            # without this, `ph[i, :k] = None` writes NaN silently and the
            # row returns corrupted audio with success status
            raise ValueError(
                f"items {bad_pair} have a mismatched cloning prompt: "
                "prompt_feat and prompt_h must be provided together with "
                "equal frame counts (PromptExtractor returns the aligned "
                "pair)"
            )
        # "_prepped" lets a server validate each item's frontend individually
        # (failing only that request) before co-batching — without re-running
        # g2p here
        prepped = [
            it.get("_prepped")
            or self.prepare_text(it["text"], it.get("lang", "yue"), it.get("phone"))
            for it in items
        ]
        t_text = max(p[2] for p in prepped)
        feats = {k: np.zeros((b, t_text), np.int32)
                 for k in ("x", "tone", "word_pos", "syllable_pos", "lang")}
        x_lengths = np.zeros((b,), np.int32)
        for i, ((x, tone, wp, sp, lang), n, _) in enumerate(prepped):
            for key, arr in (("x", x), ("tone", tone), ("word_pos", wp),
                             ("syllable_pos", sp), ("lang", lang)):
                feats[key][i, : arr.shape[1]] = np.asarray(arr)[0]
            x_lengths[i] = n[0]

        spk = np.zeros((b, self.cfg.tts.spk_embed_dim), np.float32)
        for i, it in enumerate(items):
            if it.get("spk_embed") is not None:
                spk[i] = it["spk_embed"]

        jf = {k: jnp.asarray(v) for k, v in feats.items()}
        y_lens = np.asarray(
            self._dur_fn(t_text)(
                self.params_tts, jf["x"], jnp.asarray(x_lengths), jf["lang"],
                jf["tone"], jf["word_pos"], jf["syllable_pos"], jnp.asarray(spk),
            )
        )
        y_max = int(np.ceil(y_lens.max() * length_scale))
        if y_max > bkt.MEL_BUCKETS[-1]:
            # identify the actual culprits (padding rows are copies of row
            # 0, so real indices < b_real suffice) — a server uses these to
            # fail only the over-long requests and retry the rest
            need = np.ceil(y_lens[:b_real] * length_scale)
            culprits = [
                i for i in range(b_real) if need[i] > bkt.MEL_BUCKETS[-1]
            ]
            raise OverLongBatchItems(
                f"an item needs {y_max} mel frames, past the "
                f"{bkt.MEL_BUCKETS[-1]}-frame batch table — synthesize it "
                "individually: synthesize()/synthesize_long for prompt-free "
                "text (no length cap), synthesize_streaming for cloning",
                culprits,
            )
        t_mel = bkt.pick_bucket(max(y_max, 1), bkt.MEL_BUCKETS)

        p_lens = np.array(
            [0 if it.get("prompt_feat") is None else len(it["prompt_feat"])
             for it in items],
            np.int32,
        )
        if p_lens.max() > 0:
            t_prompt = bkt.pick_prompt_bucket(int(p_lens.max()), t_mel)
            pf = np.zeros((b, t_prompt, 80), np.float32)
            ph = np.zeros((b, t_prompt, 80), np.float32)
            for i, it in enumerate(items):
                if p_lens[i]:
                    pf[i, : p_lens[i]] = it["prompt_feat"]
                    ph[i, : p_lens[i]] = it["prompt_h"]
        else:
            t_prompt = 0
            pf = np.zeros((b, 0, 80), np.float32)
            ph = np.zeros((b, 0, 80), np.float32)

        if t_prompt + t_mel > self.noise.shape[1]:
            # past this, cfm_forward's noise slice comes up short and the
            # failure is an opaque broadcast error deep in the trace
            raise NoiseBufferExceeded(
                f"prompt ({t_prompt}) + mel ({t_mel}) frames exceed the "
                f"{self.noise.shape[1]}-frame deterministic noise buffer "
                "(300 s cap, reference flow_matching.py:354); synthesize "
                "long items via synthesize_streaming/synthesize_long instead"
            )

        out = self._mel_fn((t_text, t_mel, t_prompt, n_timesteps))(
            self.params_tts, self.noise, jf["x"], jnp.asarray(x_lengths),
            jf["lang"], jf["tone"], jf["word_pos"], jf["syllable_pos"],
            jnp.asarray(spk), jnp.asarray(pf), jnp.asarray(ph),
            jnp.asarray(p_lens), length_scale=jnp.float32(length_scale),
        )
        wav = self._voc_fn(t_mel, pcm16)(self.params_hift, out.mel)

        def finalize():
            # one readback per array (a per-row int(out.mel_lengths[i])
            # costs a full tunnel RTT each — measured ~28 ms/row)
            lens_np = np.asarray(out.mel_lengths)
            wav_np = np.asarray(wav)
            mel_np = np.asarray(out.mel) if return_mel else None
            results = []
            for i in range(b_real):  # padding rows dropped
                frames = int(lens_np[i])
                samples = frames * self.cfg.audio.hop_length
                results.append(
                    SynthesisResult(
                        wav=wav_np[i, :samples],
                        mel=mel_np[i, :frames] if return_mel else None,
                        mel_frames=frames,
                        rtf=float("nan"),
                        timings={},
                    )
                )
            return results

        return finalize

    def synthesize_batch(
        self,
        items,
        n_timesteps: int = 10,
        length_scale: float = 1.0,
        return_mel: bool = True,
        pcm16: bool = False,
    ):
        """Batched synthesis; see synthesize_batch_dispatch for semantics."""
        return self.synthesize_batch_dispatch(
            items,
            n_timesteps=n_timesteps,
            length_scale=length_scale,
            return_mel=return_mel,
            pcm16=pcm16,
        )()
