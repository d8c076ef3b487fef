"""Production HTTP serving front-end (stdlib-only).

The reference has no serving layer — its inference surface is the one-shot
`infer.py` CLI (reference infer.py:271-446). This module puts the
dynamic-batching ServingEngine and the multi-session StreamingLane
(pipeline/server.py) behind a small HTTP API so the framework deploys as a
service on a TPU host:

  GET  /healthz     -> {"ok": true, "device": ...}
  GET  /stats       -> serving stats JSON (request/batch/latency counters)
  POST /tts         -> audio/wav (16-bit PCM, 24 kHz)
                       body: {"text": "...", "lang": "yue", "phone": null,
                              "spk_embed": [192 floats] (optional),
                              "ref_audio_b64": "<base64 WAV>" (optional)}
  POST /tts/stream  -> chunked-transfer audio/wav whose PCM arrives as the
                       model generates it (multi-stream lane: concurrent
                       streams share one device dispatch per tick)

Zero-shot cloning over HTTP: pass a base64-encoded PCM WAV as
`ref_audio_b64` and the server extracts prompt features (CAM++ speaker
embedding, speech tokens -> flow-encoder hidden states, 24 kHz mel) through
the on-device PromptExtractor, caching by content hash so a repeated voice
costs one extraction. Requires the server to be constructed with a
`prompt_extractor` (cli/serve.py --campplus/--s3-tokenizer/--flow-encoder).
The streaming lane conditions on the speaker embedding only (its fused slot
graph is compiled without prompt frames).

stdlib `http.server` is deliberate: zero new dependencies, and a threaded
server maps 1:1 onto the engines' Future/iterator surfaces (the GIL is
irrelevant — the hot work happens on device, and batching happens in the
engine worker, not per connection).
"""

from __future__ import annotations

import json
import struct
import threading
from collections import OrderedDict
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# WAV container helpers
# ---------------------------------------------------------------------------


def pcm16_of(wav: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] (or already-int16) -> int16 PCM."""
    if wav.dtype == np.int16:
        return wav
    return np.round(np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)


def wav_header(num_samples: int, sample_rate: int) -> bytes:
    """44-byte PCM16 mono WAV header. `num_samples < 0` emits the streaming
    convention (0xFFFFFFFF sizes): players treat the data chunk as unbounded,
    which is how chunked HTTP audio is normally served."""
    if num_samples < 0:
        data_size = 0xFFFFFFFF - 36
        riff_size = 0xFFFFFFFF
    else:
        data_size = num_samples * 2
        riff_size = data_size + 36
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", riff_size),
            b"WAVEfmt ",
            struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16),
            b"data",
            struct.pack("<I", data_size),
        ]
    )


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    pcm = pcm16_of(wav)
    return wav_header(len(pcm), sample_rate) + pcm.tobytes()


def decode_wav(data: bytes):
    """PCM WAV bytes -> (mono float32 [-1,1], sample_rate)."""
    import wave
    from io import BytesIO

    with wave.open(BytesIO(data), "rb") as f:
        sr = f.getframerate()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
        nch = f.getnchannels()
    if width == 2:
        audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        audio = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        audio = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        audio = audio.reshape(-1, nch).mean(axis=1)
    return audio, sr


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "jyutvoice-tpu"

    # quiet by default; the TTSServer collects errors
    def log_message(self, fmt, *args):  # noqa: D102
        if self.server.tts_verbose:  # type: ignore[attr-defined]
            super().log_message(fmt, *args)

    # -- helpers ------------------------------------------------------------

    def _json_body(self) -> dict:
        length = int(self.headers.get("Content-Length", "0"))
        if length <= 0:
            raise ValueError("empty request body")
        limit = getattr(self.server, "tts_max_body", 64 << 20)
        if length > limit:
            # client-supplied Content-Length is untrusted: without a cap a
            # multi-GB body would be materialized (then json-parsed and
            # base64-decoded on top) — a trivial memory-exhaustion DoS
            raise ValueError(
                f"request body is {length} bytes; the limit is {limit} "
                "(raise TTSServer max_body_bytes if intended)"
            )
        raw = self.rfile.read(length)
        body = json.loads(raw)
        if not isinstance(body, dict):
            raise ValueError("request body must be a JSON object")
        return body

    def _send_json(self, obj: dict, code: int = 200) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _send_error_json(self, code: int, msg: str) -> None:
        self._send_json({"error": msg}, code=code)

    def _chunk(self, data: bytes) -> None:
        self.wfile.write(b"%x\r\n" % len(data) + data + b"\r\n")

    # -- routes -------------------------------------------------------------

    def do_GET(self):  # noqa: N802
        srv = self.server  # type: ignore[assignment]
        if self.path == "/healthz":
            self._send_json({"ok": True, "device": srv.tts_device})
        elif self.path == "/stats":
            st = srv.tts_engine.stats
            out = {
                "requests": st.requests,
                "batches": st.batches,
                "errors": st.errors,
                "mean_batch": st.mean_batch,
                "mean_latency_ms": st.mean_latency_ms,
                "queued": srv.tts_engine._q.qsize(),
                "cached_voices": len(srv.tts_prompt_cache),
            }
            if srv.tts_lane is not None:
                out["active_streams"] = len(srv.tts_lane._handles)
            self._send_json(out)
        else:
            self._send_error_json(404, f"no such path: {self.path}")

    def do_POST(self):  # noqa: N802
        srv = self.server  # type: ignore[assignment]
        try:
            body = self._json_body()
            text = body.get("text")
            if not isinstance(text, str) or not text:
                raise ValueError("'text' (non-empty string) is required")
            kwargs = dict(
                text=text,
                lang=body.get("lang", "yue"),
                phone=body.get("phone"),
            )
            spk = body.get("spk_embed")
            if spk is not None:
                kwargs["spk_embed"] = np.asarray(spk, np.float32)
            ref_b64 = body.get("ref_audio_b64")
            if ref_b64 is not None:
                pf = self._extract_prompt(srv, ref_b64)
                kwargs["spk_embed"] = pf.spk_embed
                # prompt grafting: /tts always; /tts/stream only when the
                # lane was built with prompt capacity (otherwise degrade
                # gracefully to speaker-embedding-only voice matching,
                # the pre-capacity behavior)
                graft = self.path == "/tts" or (
                    self.path == "/tts/stream"
                    and srv.tts_lane is not None
                    and srv.tts_lane.prompt_frames > 0
                )
                if pf.prompt_h is not None and graft:
                    kwargs["prompt_feat"] = pf.prompt_feat
                    kwargs["prompt_h"] = pf.prompt_h
        except (ValueError, json.JSONDecodeError) as e:
            self._send_error_json(400, str(e))
            return
        except Exception as e:  # noqa: BLE001 — e.g. prompt extraction failure
            self._send_error_json(500, f"{type(e).__name__}: {e}")
            return

        if self.path == "/tts":
            self._tts(srv, kwargs)
        elif self.path == "/tts/stream":
            self._tts_stream(srv, kwargs)
        else:
            self._send_error_json(404, f"no such path: {self.path}")

    def _extract_prompt(self, srv, ref_b64: str):
        """base64 WAV -> PromptFeatures, memoized by content hash."""
        import base64
        import hashlib

        if srv.tts_prompt_extractor is None:
            raise ValueError(
                "this server was started without prompt models "
                "(--campplus/--s3-tokenizer/--flow-encoder); "
                "ref_audio_b64 is unavailable"
            )
        try:
            data = base64.b64decode(ref_b64, validate=True)
        except Exception as e:  # noqa: BLE001
            raise ValueError(f"ref_audio_b64 is not valid base64: {e}")
        key = hashlib.sha256(data).hexdigest()
        cache = srv.tts_prompt_cache
        with srv.tts_prompt_lock:
            if key in cache:
                cache.move_to_end(key)  # true LRU: refresh on hit
                return cache[key]
            # dedupe concurrent extraction of the same voice: first caller
            # owns the device work, the rest wait on its future
            fut = srv.tts_prompt_inflight.get(key)
            owner = fut is None
            if owner:
                fut = Future()
                srv.tts_prompt_inflight[key] = fut
        if not owner:
            # same budget as a synthesis request: the owner's extraction can
            # legitimately take minutes on a cold process (first-conv
            # autotune), so a short fixed timeout would 500 the waiters
            # moments before the cache fills
            return fut.result(timeout=srv.tts_request_timeout)
        try:
            audio, sr = decode_wav(data)
            pf = srv.tts_prompt_extractor(audio, sr)
        except BaseException as e:
            with srv.tts_prompt_lock:
                srv.tts_prompt_inflight.pop(key, None)
            fut.set_exception(e)
            raise
        with srv.tts_prompt_lock:
            while len(cache) >= srv.tts_prompt_cache_size:
                cache.popitem(last=False)  # bounded content-hash LRU
            cache[key] = pf
            srv.tts_prompt_inflight.pop(key, None)
        fut.set_result(pf)
        return pf

    def _tts(self, srv, kwargs) -> None:
        try:
            res = srv.tts_engine.submit(**kwargs).result(
                timeout=srv.tts_request_timeout
            )
        except ValueError as e:  # bad language / unknown char / bad phone
            self._send_error_json(400, str(e))
            return
        except Exception as e:  # noqa: BLE001
            self._send_error_json(500, f"{type(e).__name__}: {e}")
            return
        data = wav_bytes(res.wav, srv.tts_sample_rate)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _tts_stream(self, srv, kwargs) -> None:
        if srv.tts_lane is None:
            self._send_error_json(
                404, "streaming lane disabled (start the server with streaming)"
            )
            return
        handle = None
        try:
            # the batch engine applies the server-level length_scale
            # internally; the lane takes it per-submit — forward it so
            # /tts and /tts/stream speak at the same rate
            handle = srv.tts_lane.submit(
                length_scale=srv.tts_length_scale, **kwargs
            )
            # per-chunk timeout: a wedged/dead lane worker must not hang
            # this HTTP thread forever (the /tts route bounds its wait the
            # same way via future.result(timeout=...))
            chunks = handle.iter_timeout(srv.tts_request_timeout)
            first = next(chunks)  # surface prepare errors before headers go out
        except ValueError as e:
            self._send_error_json(400, str(e))
            return
        except StopIteration:
            first = None
        except Exception as e:  # noqa: BLE001 — incl. per-chunk TimeoutError
            if handle is not None:
                handle.cancel()
            self._send_error_json(500, f"{type(e).__name__}: {e}")
            return

        try:
            # headers + WAV header sit INSIDE the try: a client that
            # disconnected while waiting for the first chunk surfaces
            # BrokenPipeError on these writes, and the session must be
            # cancelled then too or its slot decodes into an abandoned
            # queue for the rest of the utterance
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            self._chunk(wav_header(-1, srv.tts_sample_rate))
            if first is not None:
                self._chunk(pcm16_of(np.asarray(first)).tobytes())
                for chunk in chunks:
                    self._chunk(pcm16_of(np.asarray(chunk)).tobytes())
            self._chunk(b"")  # terminator — only after a COMPLETE stream
        except Exception:  # noqa: BLE001 — mid-stream failure (lane error
            # or client disconnect): drop the connection WITHOUT the
            # chunked terminator so the client sees an aborted transfer,
            # never truncated audio dressed as a complete 200 response —
            # and cancel the lane session so the slot frees now instead of
            # decoding the rest of the utterance into an abandoned queue
            handle.cancel()
            self.close_connection = True


class TTSServer:
    """Owns the HTTP server + serving engines around one Synthesizer.

    Lifecycle: construct (starts the engine worker + HTTP thread), serve,
    `close()`. `port` is resolved after bind, so `port=0` works for tests.
    """

    def __init__(
        self,
        synthesizer,
        host: str = "127.0.0.1",
        port: int = 8080,
        *,
        max_batch: int = 8,
        max_wait_ms: float = 20.0,
        n_timesteps: int = 10,
        length_scale: float = 1.0,
        streaming: bool = False,
        max_streams: int = 4,
        chunk_frames: int = 100,
        stream_prompt_frames: int = 0,
        request_timeout: float = 600.0,
        max_body_bytes: int = 64 << 20,
        verbose: bool = False,
        prompt_extractor=None,
        prompt_cache_size: int = 16,
        sp_mesh=None,
        sp_attention: str = "scores",
        long_attention: str = "auto",
    ):
        from jyutvoice_tpu.pipeline.server import ServingEngine, StreamingLane

        self.engine = ServingEngine(
            synthesizer,
            max_batch=max_batch,
            max_wait_ms=max_wait_ms,
            n_timesteps=n_timesteps,
            length_scale=length_scale,
            pcm16=True,
            # multi-chip hosts: shard each long-form solve over the mesh
            # (dist/sp.py) instead of pinning one chip for seconds
            sp_mesh=sp_mesh,
            sp_attention=sp_attention,
            long_attention=long_attention,
        )
        self.lane = (
            StreamingLane(
                synthesizer,
                max_streams=max_streams,
                chunk_frames=chunk_frames,
                n_timesteps=n_timesteps,
                pcm16=True,
                # >0 lets /tts/stream graft cloning prompts (not just the
                # speaker embedding); every tick then pays the prompt-
                # extended segment, so it's opt-in (serve
                # --stream-prompt-frames)
                prompt_frames=stream_prompt_frames,
            )
            if streaming
            else None
        )
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.daemon_threads = True
        # handler context (BaseHTTPRequestHandler reaches these via .server)
        self._httpd.tts_engine = self.engine
        self._httpd.tts_lane = self.lane
        self._httpd.tts_sample_rate = synthesizer.cfg.audio.sample_rate
        self._httpd.tts_length_scale = length_scale
        self._httpd.tts_request_timeout = request_timeout
        self._httpd.tts_max_body = max_body_bytes
        self._httpd.tts_verbose = verbose
        self._httpd.tts_prompt_extractor = prompt_extractor
        self._httpd.tts_prompt_cache = OrderedDict()
        self._httpd.tts_prompt_cache_size = max(1, prompt_cache_size)
        self._httpd.tts_prompt_inflight = {}
        self._httpd.tts_prompt_lock = threading.Lock()
        try:
            import jax

            self._httpd.tts_device = str(jax.devices()[0])
        except Exception:  # noqa: BLE001
            self._httpd.tts_device = "unknown"
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="jyutvoice-http", daemon=True
        )
        self._thread.start()

    def close(self) -> None:
        self._httpd.shutdown()
        self._thread.join(timeout=10.0)
        self._httpd.server_close()
        self.engine.close()
        if self.lane is not None:
            self.lane.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
