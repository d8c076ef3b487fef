"""Serving soak: sustained mixed traffic must not leak (VERDICT r3 #7).

500+ requests through ServingEngine and sustained StreamingLane traffic
across mixed buckets/prompts — asserts every future resolves, no internal
buffers accumulate (pending maps, queues, handles), RSS stays bounded
after warmup, and close() leaves zero unresolved futures. A regression
net over the round-2/3 future-resolution race fixes.
"""

import gc
import os
import resource

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from tests.test_pipeline import TINY
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.server import ServingEngine, StreamingLane
from jyutvoice_tpu.pipeline.synthesize import Synthesizer

UTTS = [
    ("佢 係邊 個", "keoi5 hai6 bin1 go3"),
    ("你好", "nei5 hou2"),
    ("我 哋 去", "ngo5 dei6 heoi3"),
    ("好", "hou2"),
]


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@pytest.fixture(scope="module")
def synth():
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    return Synthesizer(TINY, params, params_hift)


def test_engine_soak_500_requests(synth):
    rng = np.random.default_rng(0)
    pf = rng.standard_normal((24, 80)).astype(np.float32)
    ph_feat = rng.standard_normal((24, 80)).astype(np.float32)

    n_total = 500
    with ServingEngine(
        synth, max_batch=8, max_wait_ms=5.0, n_timesteps=1
    ) as engine:
        # warmup wave compiles every (bucket, prompt) graph this soak uses
        warm = [
            engine.submit(t, lang="yue", phone=p) for t, p in UTTS
        ] + [
            engine.submit(UTTS[0][0], lang="yue", phone=UTTS[0][1],
                          prompt_feat=pf, prompt_h=ph_feat)
        ]
        for f in warm:
            f.result(timeout=1200)
        rss_after_warmup = _rss_mb()

        outstanding, done = [], 0
        sizes = []
        for i in range(n_total - len(warm)):
            t, p = UTTS[int(rng.integers(len(UTTS)))]
            kw = {}
            if i % 7 == 0:  # mixed cloning traffic
                kw = dict(prompt_feat=pf, prompt_h=ph_feat)
            outstanding.append(engine.submit(t, lang="yue", phone=p, **kw))
            # drain in waves so the queue stays busy but bounded
            if len(outstanding) >= 32:
                for f in outstanding:
                    r = f.result(timeout=1200)
                    assert r.mel_frames > 0
                    sizes.append(len(r.wav))
                done += len(outstanding)
                outstanding = []
        for f in outstanding:
            assert f.result(timeout=1200).mel_frames > 0
        done += len(outstanding)

        stats = engine.stats
        assert stats.requests == n_total
        assert stats.errors == 0
        # internal request queue fully drained
        assert engine._q.empty()

    # after close(): the worker is gone and nothing is pending
    assert not engine._worker.is_alive()
    gc.collect()
    # ru_maxrss is a high-water mark: the soak after warmup must not have
    # grown it much (leaked buffers of ~500 wavs would add hundreds of MB)
    growth = _rss_mb() - rss_after_warmup
    assert growth < 300.0, f"RSS grew {growth:.0f} MB during soak"


def test_engine_close_rejects_unresolved(synth):
    """Futures still queued at close() must resolve (not hang forever)."""
    import concurrent.futures

    engine = ServingEngine(synth, max_batch=4, max_wait_ms=5000.0,
                           n_timesteps=1)
    futs = [
        engine.submit(t, lang="yue", phone=p) for t, p in UTTS
    ]
    engine.close()
    for f in futs:
        try:
            r = f.result(timeout=60)
            assert r.mel_frames > 0
        except (RuntimeError, concurrent.futures.CancelledError):
            pass  # rejected-at-shutdown is acceptable; hanging is not


def test_streaming_lane_soak(synth):
    """Many short streams through one lane: every handle terminates, the
    lane's session slots free up, and repeated submits don't accumulate
    handles."""
    with StreamingLane(synth, max_streams=2, chunk_frames=50,
                      n_timesteps=1) as lane:
        for wave in range(12):
            handles = [
                lane.submit(t, lang="yue", phone=p) for t, p in UTTS[:2]
            ]
            for h in handles:
                chunks = list(h)
                assert len(chunks) >= 1
                assert all(np.isfinite(c).all() for c in chunks)
        assert len(lane._handles) <= 2
    assert not lane._worker.is_alive()
