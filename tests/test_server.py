"""Dynamic-batching serving engine: correctness vs the direct pipeline."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from tests.test_pipeline import TINY
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.server import ServingEngine
from jyutvoice_tpu.pipeline.synthesize import Synthesizer

UTTS = [
    ("佢 係邊 個", "keoi5 hai6 bin1 go3"),
    ("你好", "nei5 hou2"),
    ("我 哋 去", "ngo5 dei6 heoi3"),
]


@pytest.fixture(scope="module")
def synth():
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    return Synthesizer(TINY, params, params_hift)


def test_engine_batches_and_matches_direct(synth):
    direct = {
        text: synth.synthesize(text, lang="yue", phone=ph, n_timesteps=2)
        for text, ph in UTTS
    }
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=200.0, n_timesteps=2
    ) as engine:
        futures = [
            (text, engine.submit(text, lang="yue", phone=ph))
            for text, ph in UTTS
        ]
        results = [(text, f.result(timeout=600)) for text, f in futures]
        stats = engine.stats

    assert stats.requests == len(UTTS)
    # 200 ms window on an idle queue: all three coalesce into one batch
    assert stats.batches >= 1 and max(stats.batch_sizes) >= 2
    for text, res in results:
        ref = direct[text]
        assert res.mel_frames == ref.mel_frames
        assert res.wav.shape == ref.wav.shape
        # same bucket graph, masked padding: batched == single
        np.testing.assert_allclose(res.wav, ref.wav, atol=5e-4, rtol=1e-3)


def test_engine_error_propagates(synth):
    with ServingEngine(synth, max_batch=2, max_wait_ms=5.0) as engine:
        fut = engine.submit("abc", lang="nope-such-lang")
        with pytest.raises(Exception):
            fut.result(timeout=600)
        assert engine.stats.errors >= 1

    with pytest.raises(RuntimeError):
        engine.submit("after close", lang="yue", phone="aa1")


def test_engine_overlong_prompt_fails_only_that_request(synth):
    """An over-long cloning prompt must fail its own request at validation
    time, not poison co-batched requests (or reach the dispatch where the
    ValueError would fail the whole subgroup)."""
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=200.0, n_timesteps=2
    ) as engine:
        bad = engine.submit(
            "佢", lang="yue", phone="keoi5",
            prompt_feat=np.zeros((600, 80), np.float32),
            prompt_h=np.zeros((600, 80), np.float32),
        )
        good = engine.submit("你好", lang="yue", phone="nei5 hou2")
        with pytest.raises(ValueError, match="prompt"):
            bad.result(timeout=600)
        assert good.result(timeout=600).mel_frames > 0


def test_engine_survives_cancelled_future(synth):
    """A concurrently-cancelled future must not kill the worker thread
    (set_result on a cancelled future raises InvalidStateError): later
    requests still resolve."""
    with ServingEngine(
        synth, max_batch=2, max_wait_ms=5.0, n_timesteps=2
    ) as engine:
        fut = engine.submit("佢", lang="yue", phone="keoi5")
        fut.cancel()  # may race the worker; engine must survive either way
        res = engine.submit("你好", lang="yue", phone="nei5 hou2").result(
            timeout=600
        )
        assert res.mel_frames > 0


def test_streaming_lane(synth):
    """N concurrent streams share one dispatch per tick; each stream's
    concatenated wav matches the direct synthesize_streaming output."""
    from jyutvoice_tpu.pipeline.server import StreamingLane

    reqs = [
        ("佢", "keoi5"),
        ("好", "hou2"),
        ("係", "hai6"),
    ]
    want = [
        np.concatenate(list(synth.synthesize_streaming(
            t, lang="yue", phone=p, chunk_frames=50, n_timesteps=2,
        )))
        for t, p in reqs
    ]
    with StreamingLane(synth, max_streams=4, chunk_frames=50,
                       n_timesteps=2) as lane:
        handles = [lane.submit(t, lang="yue", phone=p) for t, p in reqs]
        got = [np.concatenate(list(h)) for h in handles]
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_streaming_lane_bad_request_isolated(synth):
    from jyutvoice_tpu.pipeline.server import StreamingLane

    with StreamingLane(synth, max_streams=2, chunk_frames=50,
                       n_timesteps=2) as lane:
        bad = lane.submit("hello", lang="no-such-lang")
        good = lane.submit("佢", lang="yue", phone="keoi5")
        with pytest.raises(ValueError):
            list(bad)
        wav = np.concatenate(list(good))
        assert np.isfinite(wav).all() and len(wav) > 0


def test_engine_split_dispatch(synth):
    """Groups past split_dispatch_at dispatch as back-to-back sub-batches;
    results still match direct synthesis per request."""
    texts = [("佢", "keoi5"), ("好", "hou2"), ("係", "hai6"), ("個", "go3"),
             ("邊", "bin1")]
    want = {
        t: synth.synthesize(t, lang="yue", phone=p, n_timesteps=2).wav
        for t, p in texts
    }
    with ServingEngine(synth, max_batch=8, max_wait_ms=300, n_timesteps=2,
                       split_dispatch_at=2) as eng:
        futs = [(t, eng.submit(t, lang="yue", phone=p)) for t, p in texts]
        for t, f in futs:
            res = f.result(timeout=300)
            np.testing.assert_allclose(res.wav, want[t], atol=1e-5)
    assert eng.stats.requests == len(texts)


def test_streaming_lane_survives_tick_failure(synth):
    """A device/tunnel failure mid-tick fails the affected streams but
    must NOT kill the lane worker (regression: a dead worker left every
    later submit hanging forever)."""
    from jyutvoice_tpu.pipeline.server import StreamingLane

    with StreamingLane(synth, max_streams=2, chunk_frames=50,
                       n_timesteps=2) as lane:
        real_tick = lane._ms.tick
        armed = {"on": True}

        def flaky_tick():
            if armed["on"]:
                armed["on"] = False
                raise RuntimeError("injected device failure")
            return real_tick()

        lane._ms.tick = flaky_tick
        doomed = lane.submit("佢", lang="yue", phone="keoi5")
        with pytest.raises(RuntimeError, match="injected"):
            list(doomed)
        # the worker is still alive: a fresh stream completes normally
        good = lane.submit("好", lang="yue", phone="hou2")
        wav = np.concatenate(list(good))
        assert np.isfinite(wav).all() and len(wav) > 0


def test_engine_partitions_mixed_lengths(synth):
    """A long request must not drag co-batched short ones up to its mel
    bucket: groups are partitioned by text bucket (>2x gap splits)."""
    short = ("佢", "keoi5")
    long_ph = " ".join(["keoi5 hai6 bin1 go3"] * 10)
    long_tx = "佢係邊個 " * 10
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=300.0, n_timesteps=1
    ) as engine:
        fs = [
            engine.submit(short[0], lang="yue", phone=short[1]),
            engine.submit(long_tx.strip(), lang="yue", phone=long_ph),
            engine.submit(short[0], lang="yue", phone=short[1]),
        ]
        res = [f.result(timeout=600) for f in fs]
        stats = engine.stats
    assert all(r.mel_frames > 0 for r in res)
    # the two shorts share one dispatch, the long goes alone (if all three
    # coalesced into one group; under scheduling jitter they may arrive as
    # separate groups, which also keeps the shorts off the long bucket)
    assert stats.dispatches >= 2


def test_batch_dispatch_overlong_culprit_indices(synth, monkeypatch):
    """synthesize_batch_dispatch identifies WHICH items exceed the batch
    mel table (OverLongBatchItems.indices), so a server can fail only
    those requests instead of the whole subgroup."""
    from jyutvoice_tpu.pipeline import buckets as bkt
    from jyutvoice_tpu.pipeline.synthesize import OverLongBatchItems

    cap = bkt.MEL_BUCKETS[-1]

    def fake_dur(t_text):
        def f(params, x, x_lengths, lang, tone, wp, sp, spk):
            out = np.full((x.shape[0],), 10, np.int64)
            out[1] = cap + 7  # item 1 is the over-long one
            return out

        return f

    monkeypatch.setattr(synth, "_dur_fn", fake_dur)
    items = [
        dict(text="佢", lang="yue", phone="keoi5"),
        dict(text="好", lang="yue", phone="hou2"),
    ]
    with pytest.raises(OverLongBatchItems) as ei:
        synth.synthesize_batch_dispatch(items, n_timesteps=2)
    assert ei.value.indices == (1,)


def test_engine_overlong_item_reroutes_incl_cloning(synth, monkeypatch):
    """Items past the batch mel table reroute through synthesize_long —
    cloning culprits included since round 4 (the long path grafts prompts
    into its fixed 512-frame head); innocent co-batched requests are
    re-dispatched, not poisoned."""
    from jyutvoice_tpu.pipeline.synthesize import OverLongBatchItems

    real = synth.synthesize_batch_dispatch

    def fake(items, **kw):
        idx = [i for i, it in enumerate(items) if it["text"] in ("佢", "我")]
        if idx:
            raise OverLongBatchItems(
                "items need 99999 mel frames, past the batch table", idx
            )
        return real(items, **kw)

    long_called = []
    real_long = type(synth).synthesize_long

    def spy(self, text, **kw):
        long_called.append((text, kw.get("prompt_feat") is not None))
        return real_long(self, text, **kw)

    monkeypatch.setattr(synth, "synthesize_batch_dispatch", fake)
    monkeypatch.setattr(type(synth), "synthesize_long", spy)
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=300.0, n_timesteps=2
    ) as engine:
        rerouted = engine.submit("佢", lang="yue", phone="keoi5")
        cloned = engine.submit(
            "我", lang="yue", phone="ngo5",
            prompt_feat=np.zeros((8, 80), np.float32),
            prompt_h=np.zeros((8, 80), np.float32),
        )
        good = engine.submit("你好", lang="yue", phone="nei5 hou2")
        assert rerouted.result(timeout=600).mel_frames > 0
        assert cloned.result(timeout=600).mel_frames > 0
        assert good.result(timeout=600).mel_frames > 0
    assert sorted(long_called) == [("佢", False), ("我", True)]
    assert engine.stats.errors == 0


def test_streaming_lane_cloning_prompt(synth):
    """A prompt-capable lane streams a cloning request identically to
    synthesize_streaming with the same prompt (which buckets 24->64), with
    a prompt-free stream co-ticking on the same graph; prompts on a
    no-capacity lane and over-capacity prompts fail loudly at submit."""
    from jyutvoice_tpu.pipeline.server import StreamingLane

    rng = np.random.default_rng(3)
    pf = rng.standard_normal((24, 80)).astype(np.float32)
    ph = rng.standard_normal((24, 80)).astype(np.float32)
    want = np.concatenate(list(synth.synthesize_streaming(
        "佢", lang="yue", phone="keoi5", chunk_frames=50, n_timesteps=2,
        prompt_feat=pf, prompt_h=ph,
    )))
    with StreamingLane(synth, max_streams=2, chunk_frames=50,
                       n_timesteps=2, prompt_frames=64) as lane:
        h = lane.submit("佢", lang="yue", phone="keoi5",
                        prompt_feat=pf, prompt_h=ph)
        h2 = lane.submit("好", lang="yue", phone="hou2")  # prompt-free
        got = np.concatenate(list(h))
        free = np.concatenate(list(h2))
        with pytest.raises(ValueError, match="capacity"):
            lane.submit("佢", lang="yue", phone="keoi5",
                        prompt_feat=np.zeros((65, 80), np.float32),
                        prompt_h=np.zeros((65, 80), np.float32))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.isfinite(free).all() and len(free) > 0

    with StreamingLane(synth, max_streams=1, chunk_frames=50,
                       n_timesteps=2) as plain:
        with pytest.raises(ValueError, match="prompt capacity"):
            plain.submit("佢", lang="yue", phone="keoi5",
                         prompt_feat=pf, prompt_h=ph)


def test_streaming_lane_cancel_frees_slot(synth):
    """Cancelling a stream (HTTP client disconnect) must free its slot for
    a waiting stream and terminate the handle, instead of decoding the
    whole remaining utterance into an abandoned queue."""
    from jyutvoice_tpu.pipeline.server import StreamingLane

    long_ph = " ".join(["keoi5 hai6 bin1 go3"] * 20)
    with StreamingLane(synth, max_streams=1, chunk_frames=50,
                       n_timesteps=2) as lane:
        doomed = lane.submit("佢係邊個 " * 20, lang="yue", phone=long_ph)
        it = iter(doomed)
        next(it)  # admitted and producing
        doomed.cancel()
        # the single slot must free: a second stream completes normally
        good = lane.submit("佢", lang="yue", phone="keoi5")
        wav = np.concatenate(list(good))
        assert np.isfinite(wav).all() and len(wav) > 0
        # and the cancelled handle terminates (buffered chunks then DONE)
        list(it)


def test_engine_long_request_sequence_parallel(synth, monkeypatch):
    """ServingEngine(sp_mesh=...): a long request's solve is sharded over
    the mesh (dist/sp.py) and matches the single-device long path."""
    from jyutvoice_tpu.dist.sp import make_sp_mesh

    long_ph = " ".join(["keoi5 hai6 bin1 go3"] * 40)  # > 512 tokens
    long_tx = ("佢係邊個 " * 40).strip()
    want = synth.synthesize_long(
        long_tx, lang="yue", phone=long_ph, n_timesteps=1, return_mel=True
    )

    seen = {}
    orig = type(synth).synthesize_long

    def spy(self, text, **kw):
        seen["mesh"] = kw.get("mesh")
        return orig(self, text, **kw)

    monkeypatch.setattr(type(synth), "synthesize_long", spy)
    mesh = make_sp_mesh(8)
    with ServingEngine(
        synth, max_batch=2, n_timesteps=1, return_mel=True, sp_mesh=mesh
    ) as engine:
        res = engine.submit(long_tx, lang="yue", phone=long_ph).result(
            timeout=600
        )
    assert seen["mesh"] is mesh
    assert res.mel_frames == want.mel_frames
    np.testing.assert_allclose(res.mel, want.mel, atol=2e-5, rtol=1e-4)
    corr = np.corrcoef(res.wav, want.wav)[0, 1]
    assert corr > 0.9999, corr


def test_engine_routes_long_singleton_via_synthesize_long(synth, monkeypatch):
    """A prompt-free request past the interactive text buckets must go
    through the one-pass long-form path (no 15000-frame cap, flash +
    windowed vocoder), not the batch bucket table."""
    calls = {}
    orig = type(synth).synthesize_long

    def spy(self, text, **kw):
        calls["text"] = text
        return orig(self, text, **kw)

    monkeypatch.setattr(type(synth), "synthesize_long", spy)
    long_ph = " ".join(["keoi5 hai6 bin1 go3"] * 40)  # > 512 tokens
    long_tx = ("佢係邊個 " * 40).strip()
    with ServingEngine(synth, max_batch=4, n_timesteps=1) as engine:
        res = engine.submit(long_tx, lang="yue", phone=long_ph).result(
            timeout=600
        )
    assert calls and res.mel_frames > 0


def test_engine_routes_long_cloning_request_with_prompt(synth, monkeypatch):
    """A long-TEXT cloning request routes through synthesize_long WITH its
    prompt pair (round 4: the long path grafts prompts; losing them here
    would silently return un-cloned audio with success status)."""
    calls = {}
    orig = type(synth).synthesize_long

    def spy(self, text, **kw):
        calls["pf"] = kw.get("prompt_feat")
        calls["ph"] = kw.get("prompt_h")
        return orig(self, text, **kw)

    monkeypatch.setattr(type(synth), "synthesize_long", spy)
    rng = np.random.default_rng(9)
    pf = rng.standard_normal((16, 80)).astype(np.float32)
    ph = rng.standard_normal((16, 80)).astype(np.float32)
    long_ph = " ".join(["keoi5 hai6 bin1 go3"] * 40)
    long_tx = ("佢係邊個 " * 40).strip()
    with ServingEngine(synth, max_batch=4, n_timesteps=1) as engine:
        res = engine.submit(
            long_tx, lang="yue", phone=long_ph,
            prompt_feat=pf, prompt_h=ph,
        ).result(timeout=600)
    assert res.mel_frames > 0
    assert calls["pf"] is pf and calls["ph"] is ph


def test_engine_bad_spk_embed_fails_only_culprit(synth):
    """A malformed spk_embed must fail at validation time (its own
    request), not raise a numpy broadcast error inside the BATCHED
    dispatch where it would fail every co-batched future."""
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=200.0, n_timesteps=2
    ) as engine:
        bad = engine.submit(
            "佢", lang="yue", phone="keoi5",
            spk_embed=np.zeros((2,), np.float32),
        )
        good = engine.submit("你好", lang="yue", phone="nei5 hou2")
        with pytest.raises(ValueError, match="spk_embed"):
            bad.result(timeout=600)
        assert good.result(timeout=600).mel_frames > 0
    assert engine.stats.errors == 1


def test_engine_half_prompt_pair_fails_only_culprit(synth):
    """prompt_feat without prompt_h must fail loudly at validation (the
    batch dispatch would otherwise write NaN rows silently), leaving
    co-batched requests untouched."""
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=200.0, n_timesteps=2
    ) as engine:
        bad = engine.submit(
            "佢", lang="yue", phone="keoi5",
            prompt_feat=np.zeros((8, 80), np.float32),
        )
        good = engine.submit("你好", lang="yue", phone="nei5 hou2")
        with pytest.raises(ValueError, match="BOTH"):
            bad.result(timeout=600)
        assert good.result(timeout=600).mel_frames > 0
    assert engine.stats.errors == 1


def test_engine_noise_cap_splits_mixed_group(synth, monkeypatch):
    """NoiseBufferExceeded is a GROUP property (mel bucket = the longest
    co-batched item): a short cloning request co-batched with a long
    prompt-free item must be re-dispatched in its own group (where the mel
    bucket is its own length) and SUCCEED, not hard-fail."""
    from jyutvoice_tpu.pipeline.synthesize import NoiseBufferExceeded

    real = synth.synthesize_batch_dispatch

    def fake(items, **kw):
        has_prompt = any(it.get("prompt_feat") is not None for it in items)
        has_free = any(it.get("prompt_feat") is None for it in items)
        if has_prompt and has_free:
            raise NoiseBufferExceeded(
                "prompt + mel frames exceed the noise buffer"
            )
        return real(items, **kw)

    monkeypatch.setattr(synth, "synthesize_batch_dispatch", fake)
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=300.0, n_timesteps=2
    ) as engine:
        pf = np.zeros((8, 80), np.float32)
        cloned = engine.submit(
            "佢", lang="yue", phone="keoi5", prompt_feat=pf, prompt_h=pf
        )
        free = engine.submit("你好", lang="yue", phone="nei5 hou2")
        assert cloned.result(timeout=600).mel_frames > 0
        assert free.result(timeout=600).mel_frames > 0
    assert engine.stats.errors == 0
    # the mixed group split into (at least) two real dispatches
    assert engine.stats.dispatches >= 2


def test_engine_noise_cap_intrinsic_prompt_failure(synth, monkeypatch):
    """When a prompt group exceeds the cap on its OWN mel bucket (cap
    applies intrinsically), only the prompt-bearing requests fail; the
    prompt-free half of the original group still succeeds."""
    from jyutvoice_tpu.pipeline.synthesize import NoiseBufferExceeded

    real = synth.synthesize_batch_dispatch

    def fake(items, **kw):
        if any(it.get("prompt_feat") is not None for it in items):
            raise NoiseBufferExceeded(
                "prompt + mel frames exceed the noise buffer"
            )
        return real(items, **kw)

    monkeypatch.setattr(synth, "synthesize_batch_dispatch", fake)
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=300.0, n_timesteps=2
    ) as engine:
        pf = np.zeros((8, 80), np.float32)
        cloned = engine.submit(
            "佢", lang="yue", phone="keoi5", prompt_feat=pf, prompt_h=pf
        )
        free = engine.submit("你好", lang="yue", phone="nei5 hou2")
        with pytest.raises(NoiseBufferExceeded):
            cloned.result(timeout=600)
        assert free.result(timeout=600).mel_frames > 0
    assert engine.stats.errors == 1


def test_engine_bad_prompt_shape_fails_only_culprit(synth):
    """A malformed prompt (wrong feature dim / ndim) must fail at
    validation time (its own request), not raise a numpy broadcast error
    inside the BATCHED dispatch where it would fail every co-batched
    future — same contract as the spk_embed shape check."""
    with ServingEngine(
        synth, max_batch=4, max_wait_ms=200.0, n_timesteps=2
    ) as engine:
        bad = engine.submit(
            "佢", lang="yue", phone="keoi5",
            prompt_feat=np.zeros((8, 79), np.float32),
            prompt_h=np.zeros((8, 79), np.float32),
        )
        good = engine.submit("你好", lang="yue", phone="nei5 hou2")
        with pytest.raises(ValueError, match=r"\(T, 80\)"):
            bad.result(timeout=600)
        assert good.result(timeout=600).mel_frames > 0
    assert engine.stats.errors == 1


def test_stream_handle_iter_timeout():
    """iter_timeout bounds the per-chunk wait: a wedged lane worker
    raises TimeoutError instead of hanging the consumer thread forever;
    normal chunk flow and termination are unchanged."""
    from jyutvoice_tpu.pipeline.server import _StreamHandle

    h = _StreamHandle()
    it = h.iter_timeout(0.05)
    with pytest.raises(TimeoutError, match="chunk"):
        next(it)

    h2 = _StreamHandle()
    h2._q.put(np.zeros(4, np.float32))
    h2._q.put(_StreamHandle._DONE)
    out = list(h2.iter_timeout(1.0))
    assert len(out) == 1 and out[0].shape == (4,)


def test_streaming_lane_sample_budget_units(synth):
    """The lane's y_len -> sample budget conversion must use the
    vocoder's samples-per-emitted-frame (cfg.hift.total_upsample), not
    the analysis hop — they only coincide at 480 in the stock config
    (streaming.py's spf rule)."""
    from jyutvoice_tpu.pipeline.server import StreamingLane

    lane = StreamingLane(synth, max_streams=1, chunk_frames=50,
                         n_timesteps=1)
    try:
        assert lane._spf == synth.cfg.hift.total_upsample == 480
    finally:
        lane.close()
