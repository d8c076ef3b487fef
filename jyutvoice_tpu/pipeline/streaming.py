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
from jyutvoice_tpu.weights.noise import rand_noise

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
        from jyutvoice_tpu.models.flow_encoder import init_stream_state

        self.params = params
        self.cfg = cfg
        self.chunk = chunk_tokens or cfg.static_chunk_size
        # capacity must be a chunk multiple (see init_stream_state docstring)
        self.t_max = ((t_max_tokens + self.chunk - 1) // self.chunk) * self.chunk
        self.state = init_stream_state(cfg, self.t_max, chunk=self.chunk)
        self._buf: list = []  # pending tokens not yet encoded
        self._consumed = 0
        self._step = jax.jit(self._raw_step, static_argnums=(1,))

    @staticmethod
    def _raw_step(params, cfg, tokens, n, ctx, n_ctx, state):
        from jyutvoice_tpu.models.flow_encoder import apply_flow_encoder_chunk

        return apply_flow_encoder_chunk(
            params, cfg, tokens, n, ctx, n_ctx, state
        )

    def _encode(self, toks: np.ndarray, n: int, ctx: np.ndarray, n_ctx: int):
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
    z_cache: np.ndarray  # (1, P+OVERLAP, 80)
    mu_cache: np.ndarray  # (1, P+OVERLAP, 80)
    prev_voc_tail: np.ndarray  # (OVERLAP, 80) vocoder mel context
    hift_source: Optional[np.ndarray]  # (1, OVERLAP*480, 1)


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
    ):
        self.cfg = cfg
        self.params_tts = params_tts
        self.params_hift = params_hift
        self.chunk = chunk_frames
        self.p_len = prompt_frames
        self._decode_fn = None
        self._voc_fn = None

    # -- compiled graphs ----------------------------------------------------

    def _get_decode_fn(self):
        if self._decode_fn is None:
            cfg = self.cfg.tts
            seg = self.p_len + OVERLAP + self.chunk

            @jax.jit
            def f(params, z, mu, spks, cond, n_valid):
                mask = (
                    jnp.arange(seg)[None, :, None] < n_valid
                ).astype(mu.dtype)
                t_span = cfm_mod.cosine_t_span(10).astype(mu.dtype)
                return cfm_mod.solve_euler_cfg(
                    params["decoder"], cfg.cfm, z * mask, t_span, mu * mask,
                    mask, spks, cond, streaming=True,
                )

            self._decode_fn = f
        return self._decode_fn

    def _get_voc_fn(self):
        if self._voc_fn is None:
            hift_cfg = self.cfg.hift

            @jax.jit
            def f(params, mel, cache_source):
                wav, src = hift_mod.hift_inference(
                    params, hift_cfg, mel, deterministic=True,
                    cache_source=cache_source,
                )
                return wav, src

            self._voc_fn = f
        return self._voc_fn

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
        seg = p + OVERLAP + self.chunk
        decode = self._get_decode_fn()
        vocode = self._get_voc_fn()
        window = hann_crossfade_window(OVERLAP)

        if p:
            assert prompt_feat is not None and prompt_h is not None
            assert prompt_feat.shape[0] >= p
        # seed-0 noise indexed by ABSOLUTE frame position (prompt then mel),
        # matching the non-streaming path (reference flow_matching.py:353-354:
        # rand_noise[:, :, :T] — position-indexed, not chunk-relative)
        noise_full = rand_noise(p + t_total)[0]  # (p + T, 80)

        state = StreamState(
            z_cache=np.zeros((1, p + OVERLAP, 80), np.float32),
            mu_cache=np.zeros((1, p + OVERLAP, 80), np.float32),
            prev_voc_tail=np.zeros((OVERLAP, 80), np.float32),
            hift_source=None,
        )
        if p:
            state.z_cache[0, :p] = noise_full[:p]
            state.mu_cache[0, :p] = prompt_h[:p]

        held: Optional[np.ndarray] = None  # last OVERLAP decoded frames,
        # not yet emitted: the next chunk RE-generates these positions from
        # the cached z/mu and the two versions are crossfaded
        # (reference fade_in_out semantics, utils/common.py:181-191)
        pos = 0  # next fresh mel position
        voc_seg = OVERLAP + self.chunk + OVERLAP  # ctx + max emit length
        while pos < t_total:
            n_new = min(self.chunk, t_total - pos)
            ov = OVERLAP if held is not None else 0
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

            mel = np.asarray(
                decode(
                    self.params_tts,
                    jnp.asarray(z_seg),
                    jnp.asarray(mu_seg),
                    jnp.asarray(spk[None]),
                    jnp.asarray(cond),
                    jnp.asarray(n_valid),
                )
            )  # (1, seg, 80)

            # update the z/mu overlap cache with the LAST OVERLAP valid frames
            tail_lo = max(n_valid - OVERLAP, 0)
            state.z_cache[0, p:] = z_seg[0, tail_lo : tail_lo + OVERLAP]
            state.mu_cache[0, p:] = mu_seg[0, tail_lo : tail_lo + OVERLAP]

            out = np.array(mel[0, p : p + ov + n_new])  # regen + fresh
            if ov:
                # crossfade the two versions of the SAME positions
                fade_in = window[:OVERLAP, None]
                fade_out = window[OVERLAP:, None]
                out[:ov] = out[:ov] * fade_in + held * fade_out

            is_last = pos + n_new >= t_total
            if is_last or ov + n_new <= OVERLAP:
                emit_mel = out
                held = None
            else:
                emit_mel = out[: ov + n_new - OVERLAP]
                held = out[ov + n_new - OVERLAP :].copy()
            l_emit = emit_mel.shape[0]

            if l_emit > 0:
                # vocode [mel-context | emitted frames] with the source cache
                voc_in = np.zeros((1, voc_seg, 80), np.float32)
                voc_in[0, :OVERLAP] = state.prev_voc_tail
                voc_in[0, OVERLAP : OVERLAP + l_emit] = emit_mel
                cache_src = (
                    jnp.asarray(state.hift_source)
                    if state.hift_source is not None
                    else jnp.zeros((1, OVERLAP * 480, 1), jnp.float32)
                )
                wav, src = vocode(
                    self.params_hift, jnp.asarray(voc_in), cache_src
                )
                wav = np.asarray(wav)
                src = np.asarray(src)
                yield wav[0, OVERLAP * 480 : (OVERLAP + l_emit) * 480]
                ctx = np.concatenate([state.prev_voc_tail, emit_mel], axis=0)
                state.prev_voc_tail = ctx[-OVERLAP:].copy()
                state.hift_source = src[
                    :, l_emit * 480 : (OVERLAP + l_emit) * 480
                ].copy()

            pos += n_new
