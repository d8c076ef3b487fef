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
        self._final = False  # set by flush() or a partial-chunk encode

    @staticmethod
    def _raw_step(params, cfg, tokens, n, ctx, n_ctx, state):
        from jyutvoice_tpu.models.flow_encoder import apply_flow_encoder_chunk

        return apply_flow_encoder_chunk(
            params, cfg, tokens, n, ctx, n_ctx, state
        )

    def _encode(self, toks: np.ndarray, n: int, ctx: np.ndarray, n_ctx: int):
        if self._final:
            # a partial chunk has been encoded (flush() mid-stream): the KV
            # write offset is no longer chunk-aligned, so the next full-width
            # padded write would CLAMP (dynamic_update_slice) and overwrite
            # the tail of the previous chunk, and the conv caches hold
            # end-of-stream padding — refuse instead of corrupting silently
            raise ValueError(
                "stream already finalized by a partial-chunk flush(); "
                "reset() before encoding a new stream"
            )
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
        if n < self.chunk:
            self._final = True
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
        # unconditional (not just when the tail chunk was partial): a
        # chunk-aligned tail still encodes with zero lookahead, so a push()
        # after flush() would silently contradict the frames already emitted
        self._final = True
        if outs:
            return np.concatenate(outs, axis=0)
        return np.zeros((0, self.cfg.proj_size), np.float32)


def hann_crossfade_window(overlap: int) -> np.ndarray:
    """(2*overlap,) hann window; first half fades in, second half fades out."""
    n = 2 * overlap
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / (n - 1)))).astype(
        np.float32
    )


def _init_session(
    p: int,
    mu_y: np.ndarray,
    prompt_feat: Optional[np.ndarray],
    prompt_h: Optional[np.ndarray],
) -> dict:
    """Host-side state for ONE streaming session — the single source of
    truth for the prompt right-alignment, absolute-position noise, and z/mu
    overlap-cache seeding rules, shared by StreamingSynthesizer.stream and
    MultiStreamSynthesizer.open so the two paths cannot drift.

    p is the prompt-bucket CAPACITY; a shorter prompt right-aligns against
    the generated frames (rows [p - p_valid, p)) and the leading rows are
    masked out in the core (p_start), so one compiled graph serves every
    prompt length in the bucket — including NO prompt at all (p_valid=0,
    whole prompt region masked): a prompt-capable multi-stream lane mixes
    cloning and plain sessions in one graph.

    Noise is seed-0 indexed by ABSOLUTE frame position (prompt then mel),
    matching the non-streaming path (reference flow_matching.py:353-354:
    rand_noise[:, :, :T] — position-indexed, not chunk-relative); beyond
    the reference's 15000-frame cap a deterministic PRNG stream extends it,
    so streaming has no 300 s limit.
    """
    t_total = mu_y.shape[0]
    if prompt_feat is not None and not p:
        # silently producing un-cloned audio is the failure mode the
        # capacity checks exist to prevent — raise on every surface that
        # reaches here (StreamingSynthesizer.stream has no earlier guard)
        raise ValueError(
            "a cloning prompt was passed but this streaming graph was "
            "compiled without prompt capacity — rebuild with "
            "prompt_frames>0"
        )
    if p and prompt_feat is not None:
        assert prompt_h is not None
        p_valid = prompt_feat.shape[0]
        if p_valid > p:
            raise ValueError(
                f"cloning prompt is {p_valid} frames but this streaming "
                f"graph was compiled with prompt capacity {p} — trim the "
                f"prompt or rebuild with prompt_frames>={p_valid}"
            )
    else:
        p_valid = 0
    p_start = p - p_valid
    noise_full = rand_noise_extended(p_valid + t_total)[0]  # (p_v + T, 80)
    # host-side z/mu overlap cache (assembled into each segment); the
    # mel/source carries (held, voc tail, HiFT source) live on-device
    z_cache = np.zeros((1, p + OVERLAP, 80), np.float32)
    mu_cache = np.zeros((1, p + OVERLAP, 80), np.float32)
    if p_valid:
        z_cache[0, p_start:p] = noise_full[:p_valid]
        mu_cache[0, p_start:p] = prompt_h[:p_valid]
    return {
        "mu_y": np.asarray(mu_y, np.float32),
        "noise": noise_full,
        "z_cache": z_cache,
        "mu_cache": mu_cache,
        "prompt_feat": prompt_feat,
        "p_valid": p_valid,
        "p_start": p_start,
        "pos": 0,
        "has_held": False,
    }


def _fill_segment(st: dict, p: int, chunk: int, mu_row, z_row, cond_row):
    """Assemble one chunk's (seg, 80) mu/z/cond rows from session state and
    decide the emit plan. Returns (n_new, ov, n_valid, l_emit, next_held,
    is_last). Layout: [prompt capacity p | OVERLAP re-generated | chunk
    fresh]; fresh frames draw noise at their ABSOLUTE position."""
    t_total = st["mu_y"].shape[0]
    pos = st["pos"]
    n_new = min(chunk, t_total - pos)
    ov = OVERLAP if st["has_held"] else 0
    p_valid, p_start = st["p_valid"], st["p_start"]
    if p_valid:
        mu_row[p_start:p] = st["mu_cache"][0, p_start:p]
        z_row[p_start:p] = st["z_cache"][0, p_start:p]
        cond_row[p_start:p] = st["prompt_feat"][:p_valid]
    if ov:
        # re-generate positions [pos-OVERLAP, pos) from cached z/mu; the
        # core crossfades them against the held copy (reference
        # fade_in_out, utils/common.py:181-191)
        mu_row[p : p + ov] = st["mu_cache"][0, p:]
        z_row[p : p + ov] = st["z_cache"][0, p:]
    mu_row[p + ov : p + ov + n_new] = st["mu_y"][pos : pos + n_new]
    z_row[p + ov : p + ov + n_new] = st["noise"][
        p_valid + pos : p_valid + pos + n_new
    ]
    n_valid = p + ov + n_new
    is_last = pos + n_new >= t_total
    if is_last or ov + n_new <= OVERLAP:
        l_emit, next_held = ov + n_new, False
    else:
        l_emit, next_held = ov + n_new - OVERLAP, True
    return n_new, ov, n_valid, l_emit, next_held, is_last


def _advance_session(
    st: dict, p: int, mu_row, z_row, n_valid: int, n_new: int,
    next_held: bool,
) -> None:
    """Post-dispatch host update: cache the segment's LAST OVERLAP valid
    frames of z/mu for the next chunk's re-generation, advance position."""
    tail_lo = max(n_valid - OVERLAP, 0)
    st["z_cache"][0, p:] = z_row[tail_lo : tail_lo + OVERLAP]
    st["mu_cache"][0, p:] = mu_row[tail_lo : tail_lo + OVERLAP]
    st["pos"] += n_new
    st["has_held"] = next_held


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
        estimator_chunk_masks: bool = False,
        pcm16: bool = False,
    ):
        if chunk_frames <= OVERLAP:
            # the emit logic holds back OVERLAP frames for the crossfade;
            # with chunk_frames <= OVERLAP every chunk takes the
            # emit-everything branch and the crossfade silently never runs
            # (periodic CFM seams at every chunk boundary)
            raise ValueError(
                f"chunk_frames={chunk_frames} must exceed the crossfade "
                f"overlap ({OVERLAP} frames)"
            )
        self.cfg = cfg
        self.params_tts = params_tts
        self.params_hift = params_hift
        self.chunk = chunk_frames
        self.p_len = prompt_frames
        self.n_timesteps = n_timesteps
        # on-device int16 conversion before readback (halves transport
        # bytes; the serving-native sample format). stream() then yields
        # int16 arrays.
        self.pcm16 = pcm16
        # the reference's chunked path runs the estimator with FULL
        # attention within each segment (ConditionalCFM.forward calls
        # solve_euler without the streaming flag, flow_matching.py:196-213);
        # True selects the 50-frame chunk-mask mode instead (the
        # CausalConditionalCFM whole-utterance streaming semantics,
        # flow_matching.py:391-401)
        self.est_masks = estimator_chunk_masks
        # samples the VOCODER emits per mel frame (= prod(upsample_rates)
        # * istft hop, 480 for the stock config) — all chunk slicing keys
        # off this, never a literal, so a non-480 hift config can't
        # silently misalign emitted samples with mel frames
        self.spf = cfg.hift.total_upsample
        self._step_fn = None

    # -- compiled graph -------------------------------------------------------

    def _make_core(self):
        """The per-session fused decode+crossfade+vocode chunk step, on
        UNBATCHED shapes — jitted directly for single-stream use and vmapped
        over a session axis by MultiStreamSynthesizer.

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
        cfg = self.cfg.tts
        hift_cfg = self.cfg.hift
        spf = self.spf  # vocoder samples per mel frame
        p = self.p_len
        seg = p + OVERLAP + self.chunk
        cap = OVERLAP + self.chunk  # max regen+fresh frames per chunk
        voc_seg = OVERLAP + cap  # mel context + max emit length
        n_steps = self.n_timesteps
        est_masks = self.est_masks
        window = jnp.asarray(hann_crossfade_window(OVERLAP))
        cfm_cfg = cfg.cfm
        if p > 0:
            # prompt buckets can be partially filled (p_start > 0 masks the
            # unused prefix). Both flash paths (in-repo pallas AND the
            # long-form stock-flash gate that fires on plain "xla") encode
            # validity as a per-row LENGTH (suffix semantics) and would
            # mis-mask a front-padded segment; "xla_scores" builds the bias
            # from the arbitrary mask pattern, so force it here.
            cfm_cfg = dataclasses.replace(
                cfm_cfg,
                estimator=dataclasses.replace(
                    cfm_cfg.estimator, attention_backend="xla_scores"
                ),
            )

        def core(
            params_tts, params_hift, z, mu, spk, cond,
            n_valid, p_start, ov, n_new, l_emit,
            held, prev_voc_tail, hift_source,
        ):
            """z/mu/cond (seg, 80), spk (80,), held/prev_voc_tail
            (OVERLAP, 80), hift_source (OVERLAP*480, 1); scalars traced.

            Valid rows are [p_start, n_valid): a partially-filled prompt
            bucket right-aligns the prompt against the generated frames and
            masks rows [0, p_start). The estimator zero-masks every conv
            input, so a zeroed prefix is exactly the implicit causal
            left-padding of the tight layout — outputs on valid rows match
            the exact-length graph.
            """
            idx = jnp.arange(seg)[:, None]
            mask = ((idx >= p_start) & (idx < n_valid)).astype(mu.dtype)
            t_span = cfm_mod.cosine_t_span(n_steps).astype(mu.dtype)
            mel = cfm_mod.solve_euler_cfg(
                params_tts["decoder"], cfm_cfg, (z * mask)[None], t_span,
                (mu * mask)[None], mask[None], spk[None], cond[None],
                streaming=est_masks,
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
                cache_source=hift_source[None],
            )
            # next chunk's mel context = last OVERLAP of [tail | emit]
            # = rows [l_emit, l_emit+OVERLAP) of voc_in
            new_tail = jax.lax.dynamic_slice(voc_in, (l_emit, 0), (OVERLAP, 80))
            new_src = jax.lax.dynamic_slice(
                src, (0, l_emit * spf, 0), (1, OVERLAP * spf, 1)
            )[0]
            upd = l_emit > 0
            new_tail = jnp.where(upd, new_tail, prev_voc_tail)
            new_src = jnp.where(upd, new_src, hift_source)
            # return only the emit window (samples [OVERLAP*480,
            # (OVERLAP+cap)*480)): the leading mel-context samples are
            # never emitted, and readback bytes dominate streaming cost
            # over the tunneled link. Optional on-device PCM16 halves the
            # bytes again (serving's wav-file-native format).
            wav_emit = jax.lax.slice_in_dim(
                wav[0], OVERLAP * spf, (OVERLAP + cap) * spf, axis=0
            )
            if self.pcm16:
                wav_emit = jnp.round(
                    jnp.clip(wav_emit, -1.0, 1.0) * 32767.0
                ).astype(jnp.int16)
            # `out` rows [0, l_emit) are the crossfaded mel frames this
            # chunk emits — returned for mel-level streaming consumers
            # and cross-parity tests; costs nothing unless read back
            return wav_emit, out, new_held, new_tail, new_src

        return core

    def _get_step_fn(self):
        if self._step_fn is None:
            core = self._make_core()

            @jax.jit
            def f(
                params_tts, params_hift, z, mu, spks, cond,
                n_valid, p_start, ov, n_new, l_emit,
                held, prev_voc_tail, hift_source,
            ):
                wav, out, new_held, new_tail, new_src = core(
                    params_tts, params_hift, z[0], mu[0], spks[0], cond[0],
                    n_valid, p_start, ov, n_new, l_emit,
                    held, prev_voc_tail, hift_source[0],
                )
                return wav, out, new_held, new_tail, new_src[None]

            self._step_fn = f
        return self._step_fn

    # -- streaming loop -----------------------------------------------------

    def stream(
        self,
        mu_y: np.ndarray,  # (T, 80) prior mean for the whole utterance
        spk: np.ndarray,  # (80,) projected speaker embedding
        prompt_feat: Optional[np.ndarray] = None,  # (P, 80)
        prompt_h: Optional[np.ndarray] = None,  # (P, 80)
        emit_mel: bool = False,
    ) -> Iterator[np.ndarray]:
        """Yield 24 kHz waveform chunks of `chunk_frames*480` samples
        (or (wav, mel) pairs with emit_mel=True)."""
        p = self.p_len
        step = self._get_step_fn()
        # session state + segment assembly rules shared with the
        # multi-stream path (_init_session/_fill_segment/_advance_session)
        st = _init_session(p, mu_y, prompt_feat, prompt_h)

        spk_dev = jnp.asarray(spk[None])
        held = jnp.zeros((OVERLAP, 80), jnp.float32)  # device-side carry of
        # the last OVERLAP decoded frames, not yet emitted: the next chunk
        # RE-generates these positions from the cached z/mu and the two
        # versions are crossfaded (reference fade_in_out, utils/common.py:181-191)
        voc_tail = jnp.zeros((OVERLAP, 80), jnp.float32)
        src_cache = jnp.zeros((1, OVERLAP * self.spf, 1), jnp.float32)
        seg = p + OVERLAP + self.chunk
        while st["pos"] < st["mu_y"].shape[0]:
            mu_seg = np.zeros((1, seg, 80), np.float32)
            z_seg = np.zeros((1, seg, 80), np.float32)
            cond = np.zeros((1, seg, 80), np.float32)
            n_new, ov, n_valid, l_emit, next_held, _is_last = _fill_segment(
                st, p, self.chunk, mu_seg[0], z_seg[0], cond[0]
            )

            wav, mel_out, held, voc_tail, src_cache = step(
                self.params_tts, self.params_hift,
                jnp.asarray(z_seg), jnp.asarray(mu_seg), spk_dev,
                jnp.asarray(cond),
                jnp.asarray(n_valid, jnp.int32),
                jnp.asarray(st["p_start"], jnp.int32),
                jnp.asarray(ov, jnp.int32),
                jnp.asarray(n_new, jnp.int32),
                jnp.asarray(l_emit, jnp.int32),
                held, voc_tail, src_cache,
            )
            _advance_session(st, p, mu_seg[0], z_seg[0], n_valid, n_new,
                             next_held)

            if l_emit > 0:
                # the single host readback per chunk (core already sliced
                # to the emit window on-device)
                wav = np.asarray(wav)
                wav_chunk = wav[: l_emit * self.spf]
                if emit_mel:
                    yield wav_chunk, np.asarray(mel_out)[:l_emit]
                else:
                    yield wav_chunk


class MultiStreamSynthesizer:
    """N concurrent streaming sessions advanced by ONE device dispatch per
    tick.

    Single-stream steady state is transport-bound on the tunneled platform
    (~28 ms readback RTT per chunk, docs/design.md); running sessions
    sequentially pays N RTTs per audio tick. Here the per-session fused
    chunk step (StreamingSynthesizer._make_core) is vmapped over a fixed
    session axis, so N live sessions share one dispatch and ONE wav
    readback per tick. Sessions join/leave dynamically; free slots ride
    along masked (l_emit=0 keeps their carries untouched).

    Beyond the reference (its streaming machinery is single-stream), per
    SURVEY §2.8's TPU-native mandate.
    """

    def __init__(
        self,
        cfg: JyutVoiceConfig,
        params_tts,
        params_hift,
        max_sessions: int = 4,
        chunk_frames: int = 100,
        prompt_frames: int = 0,
        n_timesteps: int = 10,
        estimator_chunk_masks: bool = False,
        pcm16: bool = False,
    ):
        self._ss = StreamingSynthesizer(
            cfg, params_tts, params_hift, chunk_frames, prompt_frames,
            n_timesteps, estimator_chunk_masks, pcm16,
        )
        self.cfg = cfg
        self.S = max_sessions
        self.chunk = chunk_frames
        self.p_len = prompt_frames
        self._batch_step = None
        s = max_sessions
        self._held = jnp.zeros((s, OVERLAP, 80), jnp.float32)
        self._voc_tail = jnp.zeros((s, OVERLAP, 80), jnp.float32)
        self._src = jnp.zeros((s, OVERLAP * self._ss.spf, 1), jnp.float32)
        self._spk = np.zeros((s, 80), np.float32)
        self._sessions: list = [None] * s  # per-slot host state or None
        self._pending = None  # (plan, device wav) of the last dispatch

    def _get_batch_step(self):
        if self._batch_step is None:
            core = self._ss._make_core()
            self._batch_step = jax.jit(
                jax.vmap(
                    core,
                    in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
                )
            )
        return self._batch_step

    @property
    def active(self) -> int:
        return sum(s is not None for s in self._sessions)

    def reset(self) -> None:
        """Drop every session and any in-flight dispatch (failure
        recovery): slots free, carries zeroed, ready for new open()s."""
        self._sessions = [None] * self.S
        self._pending = None
        self._held = jnp.zeros_like(self._held)
        self._voc_tail = jnp.zeros_like(self._voc_tail)
        self._src = jnp.zeros_like(self._src)
        self._spk[:] = 0.0

    def open(
        self,
        mu_y: np.ndarray,
        spk: np.ndarray,
        prompt_feat: Optional[np.ndarray] = None,
        prompt_h: Optional[np.ndarray] = None,
    ) -> int:
        """Claim a free slot for a new utterance; returns the session id."""
        t_total = mu_y.shape[0]
        if prompt_feat is not None and self.p_len == 0:
            raise ValueError(
                "this MultiStreamSynthesizer was built with prompt_frames=0"
                " — rebuild with prompt capacity to open cloning sessions"
            )
        if t_total == 0:
            # a zero-length session would never be dispatched (pos 0 >=
            # t_total 0) nor delivered, leaking the slot and making
            # run_all() spin forever
            raise ValueError("mu_y is empty (0 frames); nothing to stream")
        try:
            sid = self._sessions.index(None)
        except ValueError:
            raise RuntimeError(
                f"all {self.S} streaming slots busy; tick() until one frees"
            ) from None
        # shared session-init rules (prompt right-alignment, absolute-
        # position noise, cache seeding): _init_session
        self._sessions[sid] = _init_session(
            self.p_len, mu_y, prompt_feat, prompt_h
        )
        self._spk[sid] = spk
        self._held = self._held.at[sid].set(0.0)
        self._voc_tail = self._voc_tail.at[sid].set(0.0)
        self._src = self._src.at[sid].set(0.0)
        return sid

    def tick(self):
        """Advance every active session by one chunk with ONE dispatch,
        DOUBLE-BUFFERED: this tick's device compute is enqueued BEFORE the
        previous tick's wav readback, so the tunnel RTT hides behind
        compute.

        Returns (chunks, finished) for the PREVIOUS dispatch: chunks maps
        session id -> wav samples; finished is the set of session ids whose
        final chunk was just delivered (slots stay claimed until then, so
        ids remain unambiguous). Keep calling tick() while `active` is
        nonzero — the last wav arrives one tick after its dispatch.
        """
        pending = self._dispatch()
        prev, self._pending = self._pending, pending
        if prev is None:
            return {}, set()
        return self._deliver(prev)

    def _dispatch(self):
        s_axis, p = self.S, self.p_len
        seg = p + OVERLAP + self.chunk
        z = np.zeros((s_axis, seg, 80), np.float32)
        mu = np.zeros((s_axis, seg, 80), np.float32)
        cond = np.zeros((s_axis, seg, 80), np.float32)
        n_valid = np.zeros((s_axis,), np.int32)
        p_start_arr = np.zeros((s_axis,), np.int32)
        ov_arr = np.zeros((s_axis,), np.int32)
        n_new_arr = np.zeros((s_axis,), np.int32)
        l_emit_arr = np.zeros((s_axis,), np.int32)
        plan = {}
        for sid, st in enumerate(self._sessions):
            if st is None or st["pos"] >= st["mu_y"].shape[0]:
                continue  # free, or dispatched fully (delivery pending)
            # shared per-chunk assembly + emit plan: _fill_segment
            n_new, ov, nv, l_emit, next_held, is_last = _fill_segment(
                st, p, self.chunk, mu[sid], z[sid], cond[sid]
            )
            n_valid[sid] = nv
            p_start_arr[sid] = st["p_start"]
            ov_arr[sid] = ov
            n_new_arr[sid] = n_new
            l_emit_arr[sid] = l_emit
            plan[sid] = (n_new, l_emit, next_held, is_last)

        if not plan:
            return None

        step = self._get_batch_step()
        wav, _mel, self._held, self._voc_tail, self._src = step(
            self._ss.params_tts, self._ss.params_hift,
            jnp.asarray(z), jnp.asarray(mu), jnp.asarray(self._spk),
            jnp.asarray(cond), jnp.asarray(n_valid), jnp.asarray(p_start_arr),
            jnp.asarray(ov_arr), jnp.asarray(n_new_arr),
            jnp.asarray(l_emit_arr),
            self._held, self._voc_tail, self._src,
        )
        # host-side z/mu cache + position updates happen at DISPATCH time —
        # the next dispatch depends on them; only the wav readback waits
        for sid, (n_new, _l_emit, next_held, _is_last) in plan.items():
            st = self._sessions[sid]
            _advance_session(st, p, mu[sid], z[sid], int(n_valid[sid]),
                             n_new, next_held)
        return plan, wav

    def close(self, sid: int) -> None:
        """Release a session's slot early (client cancelled). Frees the
        slot immediately and drops the sid's share of any in-flight
        dispatch — without this, a slot reopened before that delivery
        would receive the cancelled session's audio (and be killed by its
        is_last flag)."""
        self._sessions[sid] = None
        if self._pending is not None:
            plan, _wav = self._pending
            plan.pop(sid, None)
            if not plan:
                self._pending = None

    def _deliver(self, pending):
        plan, wav = pending
        wav_np = np.asarray(wav)  # the ONE readback for all sessions
        chunks, finished = {}, set()
        for sid, (_n_new, l_emit, _next_held, is_last) in plan.items():
            if l_emit > 0:
                # core already slices to the emit window on-device
                chunks[sid] = wav_np[sid, : l_emit * self._ss.spf]
            if is_last:
                finished.add(sid)
                self._sessions[sid] = None
        return chunks, finished

    def run_all(self, requests):
        """Convenience: open all requests (<= max_sessions) and tick until
        done. Returns {index: concatenated wav}."""
        assert len(requests) <= self.S
        sid_to_idx = {}
        for i, req in enumerate(requests):
            sid_to_idx[self.open(*req)] = i
        out = {i: [] for i in range(len(requests))}
        while self.active or self._pending is not None:
            chunks, _fin = self.tick()
            for sid, wav in chunks.items():
                out[sid_to_idx[sid]].append(wav)
        return {i: np.concatenate(parts) for i, parts in out.items() if parts}
