"""HTTP serving front-end: endpoints, WAV container, streaming transfer."""

import json
import urllib.error
import urllib.request
import wave as wave_mod
from io import BytesIO

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from tests.test_pipeline import TINY
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.http_server import (
    TTSServer,
    pcm16_of,
    wav_bytes,
    wav_header,
)
from jyutvoice_tpu.pipeline.synthesize import Synthesizer

TEXT, PHONE = "佢 係邊 個", "keoi5 hai6 bin1 go3"


@pytest.fixture(scope="module")
def server():
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    srv = TTSServer(
        synth, port=0, max_batch=2, max_wait_ms=5.0, n_timesteps=2,
        streaming=True, max_streams=2, chunk_frames=50,
    )
    yield srv, synth
    srv.close()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.port}{path}"


def _post(srv, path, body, timeout=600):
    req = urllib.request.Request(
        _url(srv, path),
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_wav_container_roundtrip():
    wav = np.sin(np.linspace(0, 100, 2400)).astype(np.float32) * 0.5
    data = wav_bytes(wav, 24000)
    with wave_mod.open(BytesIO(data), "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        assert f.getsampwidth() == 2
        pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    np.testing.assert_array_equal(pcm, pcm16_of(wav))


def test_healthz_and_stats(server):
    srv, _ = server
    with urllib.request.urlopen(_url(srv, "/healthz"), timeout=60) as r:
        assert json.loads(r.read())["ok"] is True
    with urllib.request.urlopen(_url(srv, "/stats"), timeout=60) as r:
        st = json.loads(r.read())
    assert {"requests", "batches", "errors"} <= set(st)


def test_tts_endpoint_matches_direct(server):
    srv, synth = server
    direct = synth.synthesize(TEXT, lang="yue", phone=PHONE, n_timesteps=2)
    with _post(srv, "/tts", {"text": TEXT, "lang": "yue", "phone": PHONE}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    with wave_mod.open(BytesIO(data), "rb") as f:
        assert f.getframerate() == TINY.audio.sample_rate
        pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    assert len(pcm) == len(direct.wav)
    # engine runs the same bucketed graph; only PCM16 quantization differs
    np.testing.assert_allclose(
        pcm.astype(np.float32) / 32767.0, direct.wav, atol=2e-3
    )


def test_tts_bad_requests(server):
    srv, _ = server
    for body, code in [
        ({"lang": "yue"}, 400),  # no text
        ({"text": TEXT, "lang": "nope-such-lang"}, 400),
        ({"text": TEXT, "lang": "yue", "phone": "bad jyutping!!"}, 400),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, path="/tts", body=body)
        assert ei.value.code == code
        assert "error" in json.loads(ei.value.read())
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/nope", {"text": TEXT})
    assert ei.value.code == 404


def test_tts_stream_endpoint(server):
    srv, synth = server
    with _post(srv, "/tts/stream", {"text": TEXT, "lang": "yue", "phone": PHONE}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()  # urllib de-chunks transfer-encoding
    header, pcm_raw = data[:44], data[44:]
    assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
    pcm = np.frombuffer(pcm_raw, np.int16)
    direct = synth.synthesize(TEXT, lang="yue", phone=PHONE, n_timesteps=2)
    # streaming emits whole chunk_frames*480-sample ticks (clipped to the
    # true length); content is the streaming pipeline's (overlap decode),
    # so only the length is pinned here (content parity: test_streaming.py)
    assert len(pcm) == len(direct.wav)
    assert np.abs(pcm).max() > 0


def test_stream_client_disconnect_frees_lane_slot(server):
    """Dropping a /tts/stream connection mid-transfer must cancel the lane
    session (slot frees, no further decode into an abandoned queue) — not
    just abort the HTTP response."""
    import socket
    import time as time_mod

    srv, _ = server
    long_ph = " ".join([PHONE] * 30)
    body = json.dumps(
        {"text": ("佢係邊個 " * 30).strip(), "lang": "yue", "phone": long_ph}
    ).encode()
    s = socket.create_connection(("127.0.0.1", srv.port), timeout=120)
    try:
        s.sendall(
            b"POST /tts/stream HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        s.settimeout(300)
        got = b""
        while len(got) < 2048:  # headers + wav header + first pcm chunk
            chunk = s.recv(4096)
            if not chunk:
                break
            got += chunk
        assert b"200" in got.split(b"\r\n", 1)[0]
    finally:
        s.close()  # client walks away mid-utterance
    # the session must be reaped (cancel on write failure -> slot free)
    deadline = time_mod.monotonic() + 240
    while time_mod.monotonic() < deadline:
        if srv.lane._ms.active == 0 and not srv.lane._handles:
            break
        time_mod.sleep(0.2)
    assert srv.lane._ms.active == 0 and not srv.lane._handles


def test_concurrent_requests_coalesce(server):
    """Parallel clients ride one batched dispatch (dynamic batching
    through the HTTP layer), all succeed, results are per-request."""
    import threading

    srv, synth = server
    texts = [("佢 係邊 個", "keoi5 hai6 bin1 go3"),
             ("你好", "nei5 hou2"),
             ("我 哋 去", "ngo5 dei6 heoi3"),
             ("佢 係邊 個", "keoi5 hai6 bin1 go3")]
    before = srv.engine.stats.batches
    results = {}

    def post_one(i, text, phone):
        with _post(srv, "/tts", {"text": text, "lang": "yue",
                                 "phone": phone}) as r:
            results[i] = r.read()

    ts = [threading.Thread(target=post_one, args=(i, t, p))
          for i, (t, p) in enumerate(texts)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 4
    assert results[0] == results[3]  # identical requests -> identical wavs
    assert results[0] != results[1]
    # coalesced: fewer batches than requests (max_batch=2 in the fixture)
    assert srv.engine.stats.batches - before <= 3


def test_streaming_header_unbounded():
    h = wav_header(-1, 24000)
    assert h[4:8] == b"\xff\xff\xff\xff"


def test_decode_wav_roundtrip():
    from jyutvoice_tpu.pipeline.http_server import decode_wav

    wav = (np.sin(np.linspace(0, 60, 1600)) * 0.7).astype(np.float32)
    audio, sr = decode_wav(wav_bytes(wav, 16000))
    assert sr == 16000
    np.testing.assert_allclose(audio, wav, atol=1e-4)


def test_ref_audio_without_extractor_is_400(server):
    srv, _ = server
    import base64

    wav = np.zeros(1600, np.float32)
    b64 = base64.b64encode(wav_bytes(wav, 16000)).decode()
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/tts", {"text": TEXT, "lang": "yue", "phone": PHONE,
                            "ref_audio_b64": b64})
    assert ei.value.code == 400
    assert "prompt models" in json.loads(ei.value.read())["error"]


def test_sp_mesh_reaches_engine(server):
    """TTSServer(sp_mesh=...) must plumb the mesh + attention backend into
    the serving engine (the jyutvoice-serve --sp-devices contract)."""
    srv, synth = server
    assert srv.engine.sp_mesh is None  # default: single-chip long solves
    sentinel = object()
    srv2 = TTSServer(
        synth, port=0, max_batch=2, max_wait_ms=5.0, n_timesteps=2,
        sp_mesh=sentinel, sp_attention="ring", long_attention="exact",
    )
    try:
        assert srv2.engine.sp_mesh is sentinel
        assert srv2.engine.sp_attention == "ring"
        # --long-attention contract (round 4): reaches the engine too
        assert srv2.engine.long_attention == "exact"
    finally:
        srv2.close()
    assert srv.engine.long_attention == "auto"  # default


def test_ref_audio_cloning_path():
    """ref_audio_b64 -> PromptExtractor -> engine, with content-hash cache.

    Extractor has no aux models here (spk=zeros, no tokens): exercises the
    decode/b64/cache/submit plumbing; prompt numerical parity is covered by
    tests/test_tts_parity.py and tests/test_campplus.py."""
    import base64

    from jyutvoice_tpu.pipeline.prompt import PromptExtractor

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    srv = TTSServer(
        synth, port=0, max_batch=2, max_wait_ms=5.0, n_timesteps=2,
        prompt_extractor=PromptExtractor(),
    )
    try:
        rng = np.random.default_rng(0)
        ref = (rng.standard_normal(24000) * 0.1).astype(np.float32)
        b64 = base64.b64encode(wav_bytes(ref, 24000)).decode()
        body = {"text": TEXT, "lang": "yue", "phone": PHONE,
                "ref_audio_b64": b64}
        with _post(srv, "/tts", body) as r:
            first = r.read()
        with _post(srv, "/tts", body) as r:
            second = r.read()
        assert first == second
        assert len(srv._httpd.tts_prompt_cache) == 1  # memoized by hash
    finally:
        srv.close()


def test_stream_endpoint_grafts_cloning_prompt():
    """/tts/stream with ref_audio_b64 on a prompt-capable lane grafts the
    prompt (audio differs from the promptless stream); without capacity it
    degrades to speaker-embedding-only (still 200)."""
    import base64

    rng = np.random.default_rng(7)

    class FakeExtractor:
        def __call__(self, audio, sr):
            return type("PF", (), {
                "spk_embed": np.zeros(
                    TINY.tts.spk_embed_dim, np.float32
                ),
                "prompt_feat": rng0_pf,
                "prompt_h": rng0_ph,
            })()

    rng0_pf = rng.standard_normal((24, 80)).astype(np.float32)
    rng0_ph = rng.standard_normal((24, 80)).astype(np.float32)

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    srv = TTSServer(
        synth, port=0, max_batch=2, max_wait_ms=5.0, n_timesteps=2,
        streaming=True, max_streams=2, chunk_frames=50,
        stream_prompt_frames=64, prompt_extractor=FakeExtractor(),
    )
    try:
        ref = (rng.standard_normal(2400) * 0.1).astype(np.float32)
        b64 = base64.b64encode(wav_bytes(ref, 24000)).decode()
        plain_body = {"text": TEXT, "lang": "yue", "phone": PHONE}
        with _post(srv, "/tts/stream", plain_body) as r:
            plain = r.read()
        with _post(srv, "/tts/stream", {**plain_body, "ref_audio_b64": b64}) as r:
            cloned = r.read()
        # same utterance length, different audio content (the graft
        # conditioned the decode)
        assert len(plain) == len(cloned)
        assert plain[44:] != cloned[44:]
    finally:
        srv.close()


def test_stream_abort_closes_without_terminator(server, monkeypatch):
    """A mid-stream server failure must abort the chunked transfer (no
    terminating chunk), not deliver truncated audio as a complete 200."""
    import http.client

    import jyutvoice_tpu.pipeline.http_server as hs

    srv, _ = server

    def boom(x):
        raise RuntimeError("injected encode failure")

    monkeypatch.setattr(hs, "pcm16_of", boom)
    body = {"text": TEXT, "lang": "yue", "phone": PHONE}
    req = urllib.request.Request(
        _url(srv, "/tts/stream"),
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises((http.client.IncompleteRead, ConnectionError)):
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()


def test_prompt_cache_lru_and_inflight_dedup():
    """Cache is true LRU (hits refresh recency) and concurrent identical
    voices share ONE extraction."""
    import base64
    import threading as th

    calls = {"n": 0}
    gate = th.Event()

    class SlowExtractor:
        def __call__(self, audio, sr):
            calls["n"] += 1
            gate.wait(timeout=30)
            return type("PF", (), {"spk_embed": np.zeros(192, np.float32),
                                   "prompt_feat": None, "prompt_h": None})()

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    srv = TTSServer(
        synth, port=0, max_batch=2, max_wait_ms=5.0, n_timesteps=2,
        prompt_extractor=SlowExtractor(), prompt_cache_size=2,
    )
    try:
        def b64_of(seed):
            rng = np.random.default_rng(seed)
            wav = (rng.standard_normal(2400) * 0.1).astype(np.float32)
            return base64.b64encode(wav_bytes(wav, 24000)).decode()

        def post(b64):
            body = {"text": TEXT, "lang": "yue", "phone": PHONE,
                    "ref_audio_b64": b64}
            with _post(srv, "/tts", body) as r:
                r.read()

        # two concurrent requests for the SAME new voice: one extraction
        a = b64_of(0)
        t1 = th.Thread(target=post, args=(a,))
        t2 = th.Thread(target=post, args=(a,))
        t1.start(); t2.start()
        import time
        time.sleep(0.5)  # both must reach the extractor/waiter before release
        gate.set()
        t1.join(600); t2.join(600)
        assert calls["n"] == 1
        # LRU: insert B, hit A, insert C -> B (least recent) evicted, A kept
        post(b64_of(1))          # B  (cache: A, B)
        post(a)                  # hit A (recency: B, A)
        post(b64_of(2))          # C evicts B (cache: A, C)
        n_after = calls["n"]
        post(a)                  # still cached: no new extraction
        assert calls["n"] == n_after
        post(b64_of(1))          # B was evicted: re-extracts
        assert calls["n"] == n_after + 1
    finally:
        srv.close()


def test_body_size_limit_rejected_before_read(server):
    """A client-supplied multi-GB Content-Length must be rejected from
    the header alone (400), never materialized into memory — the server
    must respond without waiting for a body that size."""
    import http.client

    srv, _synth = server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    try:
        conn.putrequest("POST", "/tts")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(1 << 31))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"limit" in resp.read()
    finally:
        conn.close()
