"""Streaming (chunked) synthesis.

TPU-native implementation of the reference's latent streaming machinery
(SURVEY.md §5 "long-context"): the CFM decoder consumes fixed-size mel
chunks with

  * the 34-frame z/mu overlap cache + prompt cache
    (reference flow_matching.py:196-213 ConditionalCFM.forward),
  * chunk-causal attention masks inside the estimator
    (static_chunk_size=50, decoder.py:951-959),
  * a hann crossfade between consecutive mel chunks
    (reference utils/common.py:181-191 fade_in_out),
  * the HiFT sine-source cache to avoid waveform boundary glitches
    (generator.py:450-466).

Every chunk runs the same compiled graph (fixed shapes: prompt bucket +
overlap + chunk), so streaming jits exactly once and each step costs O(chunk).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models import cfm as cfm_mod
from jyutvoice_tpu.models import hift as hift_mod
from jyutvoice_tpu.weights.noise import rand_noise_extended

OVERLAP = 34  # frames carried between chunks (flow_matching.py:203)


class StreamingTokenEncoder:
    """Incremental speech-token -> prompt-hidden encoding (KV-cached).

    Wraps models/flow_encoder.py::apply_flow_encoder_chunk (the TPU-native
    reference forward_chunk, upsample_encoder.py:399-514) behind a push/flush
    stream interface: tokens arrive in arbitrary-sized pieces (e.g. from an
    upstream LLM), whole chunks are encoded as soon as their
    pre_lookahead context exists, and each step reuses ONE compiled graph
    and costs O(chunk * T_max) instead of re-running the whole prefix.
    """

    def __init__(self, params, cfg, t_max_tokens: int, chunk_tokens: int = 0):
        self.params = params
        self.cfg = cfg
        self.chunk = chunk_tokens or cfg.static_chunk_size
        # capacity must be a chunk multiple (see init_stream_state docstring)
        self.t_max = ((t_max_tokens + self.chunk - 1) // self.chunk) * self.chunk
        self._step = jax.jit(self._raw_step, static_argnums=(1,))
        self.reset()

    def reset(self) -> None:
        """Start a new stream, keeping the compiled step graph (the jit
        wrapper is identity-keyed — re-creating the encoder re-traces)."""
        from jyutvoice_tpu.models.flow_encoder import init_stream_state

        self.state = init_stream_state(self.cfg, self.t_max, chunk=self.chunk)
        self._buf: list = []  # pending tokens not yet encoded
        self._consumed = 0

    @staticmethod
    def _raw_step(params, cfg, tokens, n, ctx, n_ctx, state):
        from jyutvoice_tpu.models.flow_encoder import apply_flow_encoder_chunk

        return apply_flow_encoder_chunk(
            params, cfg, tokens, n, ctx, n_ctx, state
        )

    def _encode(self, toks: np.ndarray, n: int, ctx: np.ndarray, n_ctx: int):
        if self._consumed + n > self.t_max:
            # the fixed-capacity KV cache would CLAMP the write offset
            # (lax.dynamic_update_slice semantics) and silently corrupt the
            # previous chunk — refuse loudly instead
            raise ValueError(
                f"stream exceeds capacity: {self._consumed + n} tokens > "
                f"t_max={self.t_max}; construct StreamingTokenEncoder with a "
                "larger t_max_tokens (or reset() between prompts)"
            )
        c, pre = self.chunk, self.cfg.pre_lookahead_len
        tok_pad = np.zeros((1, c), np.int32)
        tok_pad[0, :n] = toks[:n]
        ctx_pad = np.zeros((1, pre), np.int32)
        ctx_pad[0, :n_ctx] = ctx[:n_ctx]
        h, self.state = self._step(
            self.params, self.cfg,
            jnp.asarray(tok_pad), jnp.asarray(n, jnp.int32),
            jnp.asarray(ctx_pad), jnp.asarray(n_ctx, jnp.int32),
            self.state,
        )
        self._consumed += n
        return np.asarray(h)[0, : n * self.cfg.upsample_stride]

    def push(self, tokens: np.ndarray) -> np.ndarray:
        """Feed new tokens; returns any newly available hidden frames
        ((n*stride, 80), possibly empty). A chunk is emitted once its
        lookahead context (the next chunk's first pre_lookahead_len tokens)
        has arrived."""
        self._buf.extend(int(t) for t in np.asarray(tokens).reshape(-1))
        pre = self.cfg.pre_lookahead_len
        outs = []
        while len(self._buf) >= self.chunk + pre:
            toks = np.asarray(self._buf[: self.chunk], np.int32)
            ctx = np.asarray(self._buf[self.chunk : self.chunk + pre], np.int32)
            outs.append(self._encode(toks, self.chunk, ctx, pre))
            self._buf = self._buf[self.chunk :]
        if outs:
            return np.concatenate(outs, axis=0)
        return np.zeros((0, self.cfg.proj_size), np.float32)

    def flush(self) -> np.ndarray:
        """End of stream: encode the remaining tokens (zero lookahead at the
        true end, like the reference's final chunk)."""
        outs = []
        while self._buf:
            n = min(self.chunk, len(self._buf))
            toks = np.asarray(self._buf[:n], np.int32)
            rest = self._buf[n : n + self.cfg.pre_lookahead_len]
            ctx = np.asarray(rest, np.int32) if rest else np.zeros(0, np.int32)
            outs.append(self._encode(toks, n, ctx, len(rest)))
            self._buf = self._buf[n:]
        if outs:
            return np.concatenate(outs, axis=0)
        return np.zeros((0, self.cfg.proj_size), np.float32)


def hann_crossfade_window(overlap: int) -> np.ndarray:
    """(2*overlap,) hann window; first half fades in, second half fades out."""
    n = 2 * overlap
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / (n - 1)))).astype(
        np.float32
    )


@dataclasses.dataclass
class StreamState:
    """Host-side z/mu overlap cache (the mel/source carries live on-device)."""

    z_cache: np.ndarray  # (1, P+OVERLAP, 80)
    mu_cache: np.ndarray  # (1, P+OVERLAP, 80)


class StreamingSynthesizer:
    """Chunked mel decoding + vocoding over a precomputed prior `mu_y`.

    The text half (encoder + durations + expand) runs once up front — it is
    cheap and non-causal in the reference too; chunking applies to the CFM
    decoder and vocoder, which dominate cost.
    """

    def __init__(
        self,
        cfg: JyutVoiceConfig,
        params_tts,
        params_hift,
        chunk_frames: int = 100,  # 2 s of mel (must be a chunk-mask multiple)
        prompt_frames: int = 0,
        n_timesteps: int = 10,
    ):
        self.cfg = cfg
        self.params_tts = params_tts
        self.params_hift = params_hift
        self.chunk = chunk_frames
        self.p_len = prompt_frames
        self.n_timesteps = n_timesteps
        self._step_fn = None

    # -- compiled graph -------------------------------------------------------

    def _get_step_fn(self):
        """ONE fused decode+crossfade+vocode graph per chunk.

        The unfused loop made two device dispatches per chunk (decode,
        vocode) each fenced by a host readback; on a tunneled platform the
        ~28 ms RTT per readback dominated (docs/design.md "Streaming").
        Fusing the crossfade + vocoder-input assembly on-device leaves one
        dispatch and one readback (the wav) per chunk. All cross-chunk
        carries (held frames, vocoder mel tail, HiFT source cache) stay on
        the device between steps.

        Traced scalars (ov, n_new, l_emit) keep the shapes static so every
        chunk — first (no held), steady, and final partial — shares one
        compiled program.
        """
        if self._step_fn is None:
            cfg = self.cfg.tts
            hift_cfg = self.cfg.hift
            p = self.p_len
            seg = p + OVERLAP + self.chunk
            cap = OVERLAP + self.chunk  # max regen+fresh frames per chunk
            voc_seg = OVERLAP + cap  # mel context + max emit length
            n_steps = self.n_timesteps
            window = jnp.asarray(hann_crossfade_window(OVERLAP))

            @jax.jit
            def f(
                params_tts, params_hift, z, mu, spks, cond,
                n_valid, ov, n_new, l_emit,
                held, prev_voc_tail, hift_source,
            ):
                mask = (
                    jnp.arange(seg)[None, :, None] < n_valid
                ).astype(mu.dtype)
                t_span = cfm_mod.cosine_t_span(n_steps).astype(mu.dtype)
                mel = cfm_mod.solve_euler_cfg(
                    params_tts["decoder"], cfg.cfm, z * mask, t_span,
                    mu * mask, mask, spks, cond, streaming=True,
                )  # (1, seg, 80)
                out = mel[0, p:]  # (cap, 80); rows [0, ov+n_new) are valid

                # crossfade the re-generated frames with the held versions
                # of the SAME positions (reference utils/common.py:181-191)
                faded = (
                    out[:OVERLAP] * window[:OVERLAP, None]
                    + held * window[OVERLAP:, None]
                )
                use_fade = (jnp.arange(cap) < ov)[:, None]
                out = jnp.where(
                    use_fade,
                    jnp.pad(faded, ((0, cap - OVERLAP), (0, 0))),
                    out,
                )
                # frames held back for the next crossfade:
                # out[ov+n_new-OVERLAP : ov+n_new]
                new_held = jax.lax.dynamic_slice(
                    out, (jnp.maximum(ov + n_new - OVERLAP, 0), 0),
                    (OVERLAP, 80),
                )

                # vocode [mel tail | emitted frames | zeros] with source cache
                voc_in = jnp.zeros((voc_seg, 80), out.dtype)
                voc_in = jax.lax.dynamic_update_slice(
                    voc_in, prev_voc_tail, (0, 0)
                )
                voc_in = jax.lax.dynamic_update_slice(voc_in, out, (OVERLAP, 0))
                emit_mask = (jnp.arange(voc_seg) < OVERLAP + l_emit)[:, None]
                voc_in = jnp.where(emit_mask, voc_in, 0.0)
                wav, src = hift_mod.hift_inference(
                    params_hift, hift_cfg, voc_in[None], deterministic=True,
                    cache_source=hift_source,
                )
                # next chunk's mel context = last OVERLAP of [tail | emit]
                # = rows [l_emit, l_emit+OVERLAP) of voc_in
                new_tail = jax.lax.dynamic_slice(voc_in, (l_emit, 0), (OVERLAP, 80))
                new_src = jax.lax.dynamic_slice(
                    src, (0, l_emit * 480, 0), (1, OVERLAP * 480, 1)
                )
                upd = l_emit > 0
                new_tail = jnp.where(upd, new_tail, prev_voc_tail)
                new_src = jnp.where(upd, new_src, hift_source)
                return wav[0], new_held, new_tail, new_src

            self._step_fn = f
        return self._step_fn

    # -- streaming loop -----------------------------------------------------

    def stream(
        self,
        mu_y: np.ndarray,  # (T, 80) prior mean for the whole utterance
        spk: np.ndarray,  # (80,) projected speaker embedding
        prompt_feat: Optional[np.ndarray] = None,  # (P, 80)
        prompt_h: Optional[np.ndarray] = None,  # (P, 80)
    ) -> Iterator[np.ndarray]:
        """Yield 24 kHz waveform chunks of `chunk_frames*480` samples."""
        t_total = mu_y.shape[0]
        p = self.p_len
        step = self._get_step_fn()

        if p:
            assert prompt_feat is not None and prompt_h is not None
            assert prompt_feat.shape[0] >= p
        # seed-0 noise indexed by ABSOLUTE frame position (prompt then mel),
        # matching the non-streaming path (reference flow_matching.py:353-354:
        # rand_noise[:, :, :T] — position-indexed, not chunk-relative);
        # beyond the reference's 15000-frame cap a deterministic PRNG
        # stream extends it, so streaming has no 300 s limit
        noise_full = rand_noise_extended(p + t_total)[0]  # (p + T, 80)

        # host-side z/mu overlap cache (assembled into each segment); the
        # mel/source carries (held, voc tail, HiFT source) live on-device
        state = StreamState(
            z_cache=np.zeros((1, p + OVERLAP, 80), np.float32),
            mu_cache=np.zeros((1, p + OVERLAP, 80), np.float32),
        )
        if p:
            state.z_cache[0, :p] = noise_full[:p]
            state.mu_cache[0, :p] = prompt_h[:p]

        spk_dev = jnp.asarray(spk[None])
        held = jnp.zeros((OVERLAP, 80), jnp.float32)  # device-side carry of
        # the last OVERLAP decoded frames, not yet emitted: the next chunk
        # RE-generates these positions from the cached z/mu and the two
        # versions are crossfaded (reference fade_in_out, utils/common.py:181-191)
        has_held = False
        voc_tail = jnp.zeros((OVERLAP, 80), jnp.float32)
        src_cache = jnp.zeros((1, OVERLAP * 480, 1), jnp.float32)
        pos = 0  # next fresh mel position
        while pos < t_total:
            n_new = min(self.chunk, t_total - pos)
            ov = OVERLAP if has_held else 0
            seg = p + OVERLAP + self.chunk
            mu_seg = np.zeros((1, seg, 80), np.float32)
            z_seg = np.zeros((1, seg, 80), np.float32)
            cond = np.zeros((1, seg, 80), np.float32)
            if p:
                mu_seg[0, :p] = state.mu_cache[0, :p]
                z_seg[0, :p] = state.z_cache[0, :p]
                cond[0, :p] = prompt_feat[:p]
            if ov:
                # re-generate positions [pos-OVERLAP, pos) from cached z/mu
                mu_seg[0, p : p + ov] = state.mu_cache[0, p:]
                z_seg[0, p : p + ov] = state.z_cache[0, p:]
            mu_seg[0, p + ov : p + ov + n_new] = mu_y[pos : pos + n_new]
            # fresh frames draw noise at their ABSOLUTE position
            z_seg[0, p + ov : p + ov + n_new] = noise_full[p + pos : p + pos + n_new]
            n_valid = p + ov + n_new

            is_last = pos + n_new >= t_total
            if is_last or ov + n_new <= OVERLAP:
                l_emit = ov + n_new
                next_held = False
            else:
                l_emit = ov + n_new - OVERLAP
                next_held = True

            wav, held, voc_tail, src_cache = step(
                self.params_tts, self.params_hift,
                jnp.asarray(z_seg), jnp.asarray(mu_seg), spk_dev,
                jnp.asarray(cond),
                jnp.asarray(n_valid, jnp.int32),
                jnp.asarray(ov, jnp.int32),
                jnp.asarray(n_new, jnp.int32),
                jnp.asarray(l_emit, jnp.int32),
                held, voc_tail, src_cache,
            )
            has_held = next_held

            # update the z/mu overlap cache with the LAST OVERLAP valid frames
            tail_lo = max(n_valid - OVERLAP, 0)
            state.z_cache[0, p:] = z_seg[0, tail_lo : tail_lo + OVERLAP]
            state.mu_cache[0, p:] = mu_seg[0, tail_lo : tail_lo + OVERLAP]

            if l_emit > 0:
                # the single host readback per chunk
                wav = np.asarray(wav)
                yield wav[OVERLAP * 480 : (OVERLAP + l_emit) * 480]

            pos += n_new
