"""Incremental KV-cached FlowEncoder forward_chunk == full-sequence streaming.

The chained chunk path (models/flow_encoder.py::apply_flow_encoder_chunk,
reference upsample_encoder.py:399-514) must reproduce the full-sequence
chunk-masked forward exactly: same lookahead conv context, same conv caches
across boundaries, same full-left-context attention with ESPnet rel-pos.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import FlowEncoderConfig
from jyutvoice_tpu.models.flow_encoder import (
    apply_flow_encoder,
    apply_flow_encoder_chunk,
    init_flow_encoder,
    init_stream_state,
)

CFG = dataclasses.replace(
    FlowEncoderConfig(),
    vocab_size=50,
    input_size=64,
    output_size=64,
    proj_size=80,
    attention_heads=4,
    linear_units=96,
    num_blocks=2,
    num_up_blocks=2,
    static_chunk_size=4,
)


@pytest.fixture(scope="module")
def params():
    return init_flow_encoder(jax.random.PRNGKey(0), CFG)


def _run_chunked(params, tokens_np, length, t_max, chunk):
    """Chain apply_flow_encoder_chunk over the utterance; returns (T*2, 80)."""
    pre = CFG.pre_lookahead_len
    state = init_stream_state(CFG, t_max)
    step = jax.jit(apply_flow_encoder_chunk, static_argnums=(1,))

    outs = []
    pos = 0
    padded = np.zeros((1, ((length + chunk - 1) // chunk) * chunk), np.int32)
    padded[0, :length] = tokens_np[0, :length]
    while pos < length:
        n = min(chunk, length - pos)
        tok = padded[:, pos : pos + chunk]
        ctx = np.zeros((1, pre), np.int32)
        n_ctx = min(pre, length - (pos + n)) if pos + n < length else 0
        if n_ctx > 0:
            ctx[0, :n_ctx] = padded[0, pos + n : pos + n + n_ctx]
        h, state = step(
            params, CFG,
            jnp.asarray(tok), jnp.asarray(n, jnp.int32),
            jnp.asarray(ctx), jnp.asarray(n_ctx, jnp.int32),
            state,
        )
        outs.append(np.asarray(h)[0, : n * CFG.upsample_stride])
        pos += n
    return np.concatenate(outs, axis=0), state


@pytest.mark.parametrize("length", [8, 11])
def test_chunked_matches_full_sequence(params, length):
    """Full-seq run at t == length (no pad rows): the chunked path's
    feature-zero tail treatment matches the reference forward_chunk, whereas
    full-seq pad rows carry layernorm-of-zero values — so exact parity is
    defined against the unpadded full-sequence graph."""
    chunk = CFG.static_chunk_size
    t_pad = ((length + chunk - 1) // chunk) * chunk
    rng = np.random.default_rng(3)
    tokens = np.zeros((1, t_pad), np.int32)
    tokens[0, :length] = rng.integers(0, CFG.vocab_size, length)

    full, _ = apply_flow_encoder(
        params, CFG, jnp.asarray(tokens[:, :length]),
        jnp.asarray([length], jnp.int32), streaming=True,
    )
    full = np.asarray(full)[0, : length * CFG.upsample_stride]

    chunked, state = _run_chunked(params, tokens, length, t_pad, chunk)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, rtol=2e-4, atol=2e-5)
    assert int(state.offset) == length


def test_chunked_single_compile(params):
    """Every chunk reuses ONE compiled graph (static shapes)."""
    chunk = CFG.static_chunk_size
    length = 3 * chunk
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, CFG.vocab_size, (1, length)).astype(np.int32)

    compiled = jax.jit(apply_flow_encoder_chunk, static_argnums=(1,))
    state = init_stream_state(CFG, length)
    n_compiles = 0
    pos = 0
    with jax.log_compiles():
        import logging

        class Counter(logging.Handler):
            def emit(self, record):
                nonlocal n_compiles
                if "Compiling" in record.getMessage():
                    n_compiles += 1

        h = Counter()
        logging.getLogger("jax._src.dispatch").addHandler(h)
        try:
            while pos < length:
                _, state = compiled(
                    params, CFG,
                    jnp.asarray(tokens[:, pos : pos + chunk]),
                    jnp.asarray(chunk, jnp.int32),
                    jnp.zeros((1, CFG.pre_lookahead_len), jnp.int32),
                    jnp.asarray(0, jnp.int32),
                    state,
                )
                pos += chunk
        finally:
            logging.getLogger("jax._src.dispatch").removeHandler(h)
    assert n_compiles <= 1, f"chunk fn recompiled: {n_compiles} compiles"


def test_streaming_token_encoder_pipeline(params):
    """pipeline.StreamingTokenEncoder (push in irregular pieces + flush)
    reproduces the full-sequence streaming forward."""
    from jyutvoice_tpu.pipeline.streaming import StreamingTokenEncoder

    length = 11
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, CFG.vocab_size, length).astype(np.int32)

    full, _ = apply_flow_encoder(
        params, CFG, jnp.asarray(tokens[None]),
        jnp.asarray([length], jnp.int32), streaming=True,
    )
    full = np.asarray(full)[0]

    enc = StreamingTokenEncoder(params, CFG, t_max_tokens=12)
    outs = [enc.push(tokens[:3]), enc.push(tokens[3:4]),
            enc.push(tokens[4:9]), enc.push(tokens[9:]), enc.flush()]
    streamed = np.concatenate(outs, axis=0)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=2e-4, atol=2e-5)


def test_streaming_token_encoder_capacity_guard(params):
    """Pushing past t_max must raise (the fixed-capacity KV cache would
    otherwise CLAMP the write offset and silently corrupt the stream)."""
    import numpy as np
    import pytest

    from jyutvoice_tpu.pipeline.streaming import StreamingTokenEncoder

    enc = StreamingTokenEncoder(params, CFG, t_max_tokens=2 * CFG.static_chunk_size)
    c = enc.chunk
    rng = np.random.default_rng(0)
    enc.push(rng.integers(0, 10, 2 * c + CFG.pre_lookahead_len))
    with pytest.raises(ValueError, match="capacity"):
        enc.flush()  # the held-back tail would write past t_max
    # reset() reuses the compiled step and starts clean
    enc.reset()
    out = enc.push(rng.integers(0, 10, c + CFG.pre_lookahead_len))
    assert out.shape[0] == c * CFG.upsample_stride


def test_streaming_token_encoder_finalized_guard(params):
    """After a partial-chunk flush() the KV write offset is no longer
    chunk-aligned and the conv caches hold end-of-stream padding: further
    encoding must raise (it would silently corrupt the cache), and reset()
    must clear the condition."""
    import numpy as np
    import pytest

    from jyutvoice_tpu.pipeline.streaming import StreamingTokenEncoder

    enc = StreamingTokenEncoder(
        params, CFG, t_max_tokens=4 * CFG.static_chunk_size
    )
    c = enc.chunk
    rng = np.random.default_rng(1)
    enc.push(rng.integers(0, 10, c + 5))
    enc.flush()  # encodes a 5-token partial chunk -> stream finalized
    enc.push(rng.integers(0, 10, c))  # buffers only; under chunk+pre
    with pytest.raises(ValueError, match="finalized"):
        enc.push(rng.integers(0, 10, c + CFG.pre_lookahead_len))
    enc.reset()
    out = enc.push(rng.integers(0, 10, c + CFG.pre_lookahead_len))
    assert out.shape[0] == c * CFG.upsample_stride


def test_exact_pad_bucket_invariance(params):
    """exact_pad=True: zero-padded bucketed run == exact-length run on the
    valid prefix (enables per-bucket jit in PromptExtractor); and at exact
    length it is identical to the default (reference-padded) semantics."""
    import numpy as np

    from jyutvoice_tpu.models.flow_encoder import apply_flow_encoder

    rng = np.random.default_rng(0)
    for n, t_pad in [(17, 32), (9, 48)]:
        toks = rng.integers(1, 50, (1, n)).astype(np.int32)
        he, _ = apply_flow_encoder(
            params, CFG, jnp.asarray(toks), jnp.asarray([n], jnp.int32),
            exact_pad=True,
        )
        padded = np.zeros((1, t_pad), np.int32)
        padded[0, :n] = toks[0]
        hp, _ = apply_flow_encoder(
            params, CFG, jnp.asarray(padded), jnp.asarray([n], jnp.int32),
            exact_pad=True,
        )
        np.testing.assert_allclose(
            np.asarray(hp)[0, : 2 * n], np.asarray(he)[0, : 2 * n],
            rtol=1e-5, atol=1e-5,
        )
        hd, _ = apply_flow_encoder(
            params, CFG, jnp.asarray(toks), jnp.asarray([n], jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(he), np.asarray(hd))
