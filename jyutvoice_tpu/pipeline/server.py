"""Dynamic-batching serving engine.

The reference serves strictly batch-1 (synthesise() asserts B==1,
jyutvoice_tts.py:206-211) and its TensorRT path is single-stream. On TPU the
economics invert: estimator throughput scales monotonically with batch
(docs/design.md serving table: 307 -> 337 aggregate xRT from batch 1 to 8),
so a production server should coalesce concurrent requests into one device
dispatch. This engine does that:

  * submit() enqueues a request and returns a concurrent.futures.Future;
  * a worker thread drains the queue, waits up to `max_wait_ms` for
    stragglers (classic dynamic batching), groups up to `max_batch`
    requests, and runs ONE bucketed-jit synthesize_batch call;
  * mixed lengths ride the existing bucket padding + masks, so any group
    shares a compiled graph (per bucket tuple), and results are sliced back
    per request.

Throughput/latency knobs: max_batch bounds tail latency under load,
max_wait_ms bounds added latency when idle (a lone request waits at most
one window). Stats expose realized batch sizes and per-request wall times.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent import futures
from concurrent.futures import Future
from typing import List, Optional

import numpy as np

from jyutvoice_tpu.pipeline import buckets as bkt


@dataclasses.dataclass
class ServeStats:
    requests: int = 0
    batches: int = 0  # finalize rounds (one per collected group)
    dispatches: int = 0  # device dispatches (text-bucket/split partitions)
    errors: int = 0
    total_wait_s: float = 0.0  # queue wait (submit -> batch start)
    total_latency_s: float = 0.0  # submit -> result
    batch_sizes: Optional[List[int]] = None

    def __post_init__(self):
        if self.batch_sizes is None:
            self.batch_sizes = []

    @property
    def mean_batch(self) -> float:
        return float(np.mean(self.batch_sizes)) if self.batch_sizes else 0.0

    @property
    def mean_latency_ms(self) -> float:
        return (
            1000.0 * self.total_latency_s / self.requests if self.requests else 0.0
        )


class _Request:
    __slots__ = ("item", "future", "t_submit")

    def __init__(self, item: dict):
        self.item = item
        self.future: Future = Future()
        self.t_submit = time.perf_counter()


class ServingEngine:
    """Coalesces concurrent synthesis requests into batched device calls.

    n_timesteps/length_scale are engine-level (one compiled graph family);
    run separate engines for different sampling settings.

    Long-form requests (text past the interactive buckets) route through
    synthesize_long and occupy the device for seconds; with a single chip
    this inherently delays co-arriving interactive requests (the solve
    itself is the device time, not a scheduling artifact). Deployments
    mixing interactive and multi-minute traffic should run them on
    separate engine instances/chips, or use StreamingLane for the long
    jobs (time-sliced with other streams). On a multi-chip host, pass
    sp_mesh (a jax.sharding.Mesh with a "seq" axis — dist/sp.py
    make_sp_mesh) to shard each long solve across the mesh: per-chip
    attention memory/FLOPs drop n_seq-fold, shrinking both the long
    request's latency and the head-of-line window it imposes
    (`jyutvoice-serve --sp-devices N`).
    """

    def __init__(
        self,
        synthesizer,
        max_batch: int = 8,
        max_wait_ms: float = 20.0,
        n_timesteps: int = 10,
        length_scale: float = 1.0,
        return_mel: bool = False,
        pcm16: bool = False,
        split_dispatch_at: int = 8,
        sp_mesh=None,
        sp_attention: str = "scores",
        long_attention: str = "auto",
    ):
        self.synth = synthesizer
        self.max_batch = max_batch
        self.split_dispatch_at = split_dispatch_at
        self.sp_mesh = sp_mesh
        self.sp_attention = sp_attention
        # single-device long-form attention mode: "auto" (banded past the
        # config threshold), "banded", or "exact" (ignored under sp_mesh)
        self.long_attention = long_attention
        self.max_wait_s = max_wait_ms / 1000.0
        self.n_timesteps = n_timesteps
        self.length_scale = length_scale
        # serving defaults skip the mel readback (wav is the product) and
        # can emit int16 PCM on-device — host-transfer bytes dominate over
        # a tunneled link (docs/design.md)
        self.return_mel = return_mel
        self.pcm16 = pcm16
        self.stats = ServeStats()
        self._q: "queue.SimpleQueue[_Request]" = queue.SimpleQueue()
        self._stop = threading.Event()
        # guards the stop-check+enqueue in submit() against close(): without
        # it a submit racing a full close() could enqueue after the drain,
        # leaving its Future unresolved forever
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(
            target=self._run, name="jyutvoice-serving", daemon=True
        )
        self._worker.start()

    # -- client API ----------------------------------------------------------

    def submit(
        self,
        text: str,
        lang: str = "yue",
        phone: Optional[str] = None,
        spk_embed: Optional[np.ndarray] = None,
        prompt_feat: Optional[np.ndarray] = None,
        prompt_h: Optional[np.ndarray] = None,
    ) -> Future:
        """Enqueue one utterance; the Future resolves to a SynthesisResult."""
        req = _Request(
            {
                "text": text,
                "lang": lang,
                "phone": phone,
                "spk_embed": spk_embed,
                "prompt_feat": prompt_feat,
                "prompt_h": prompt_h,
            }
        )
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("engine is closed")
            self._q.put(req)
        return req.future

    def synthesize(self, *args, **kwargs):
        """Blocking convenience wrapper around submit()."""
        return self.submit(*args, **kwargs).result()

    def close(self, timeout: float = 30.0) -> None:
        with self._submit_lock:
            self._stop.set()
            self._q.put(None)  # wake the worker
        self._worker.join(timeout)
        # fail anything still queued (raced with close) instead of hanging
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None and not req.future.done():
                self._resolve(
                    req.future, req.future.set_exception,
                    RuntimeError("engine is closed"),
                )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker --------------------------------------------------------------

    def _collect(self) -> List[_Request]:
        """Block for the first request, then batch stragglers for one window."""
        first = self._q.get()
        if first is None:
            return []
        group = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(group) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                req = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # re-signal shutdown after this batch
                break
            group.append(req)
        return group

    @staticmethod
    def _resolve(future, set_fn, value) -> None:
        """Resolve a future, tolerating a concurrent cancel(): the
        cancelled() check and set_result/set_exception are not atomic, and
        an InvalidStateError here would kill the worker thread and hang the
        engine forever."""
        if future.cancelled():
            return
        try:
            set_fn(value)
        except futures.InvalidStateError:
            pass  # cancelled (or already resolved) in the check-act window

    def _fail(self, group: List[_Request], e: Exception) -> None:
        for req in group:
            self._resolve(req.future, req.future.set_exception, e)
        self.stats.errors += len(group)

    def _validate(self, group: List[_Request]) -> List[_Request]:
        """Run the text frontend + per-item limit checks per request; fail
        only the bad ones.

        Without this, one malformed request (unknown lang, bad phone
        string, over-long cloning prompt) raising inside the batched
        dispatch would fail every co-batched future. The prep is cached on
        the item so synthesize_batch_dispatch does not redo it.
        """

        ok = []
        spk_dim = self.synth.cfg.tts.spk_embed_dim
        for req in group:
            try:
                it = req.item
                pf = it.get("prompt_feat")
                ph = it.get("prompt_h")
                if (pf is None) != (ph is None):
                    raise ValueError(
                        "voice cloning needs BOTH prompt_feat and prompt_h "
                        "(PromptExtractor returns the pair); got only one"
                    )
                if pf is not None and len(pf) != len(ph):
                    raise ValueError(
                        f"prompt_feat ({len(pf)} frames) and prompt_h "
                        f"({len(ph)} frames) must be aligned"
                    )
                if pf is not None and len(pf) > bkt.PROMPT_BUCKETS[-1]:
                    raise ValueError(
                        f"cloning prompt is {len(pf)} mel frames; the "
                        f"largest prompt bucket is {bkt.PROMPT_BUCKETS[-1]} "
                        f"(~{bkt.PROMPT_BUCKETS[-1] // 50} s) — trim the "
                        "reference audio"
                    )
                if pf is not None:
                    n_feats = self.synth.cfg.audio.n_mels
                    pfa, pha = np.asarray(pf), np.asarray(ph)
                    if (
                        pfa.ndim != 2 or pfa.shape[1] != n_feats
                        or pha.ndim != 2 or pha.shape[1] != n_feats
                    ):
                        # a malformed prompt would otherwise raise a numpy
                        # broadcast error inside the BATCHED dispatch,
                        # failing every co-batched request (same rationale
                        # as the spk_embed shape check below)
                        raise ValueError(
                            f"prompt_feat/prompt_h must be (T, {n_feats}); "
                            f"got {pfa.shape} / {pha.shape}"
                        )
                spk = it.get("spk_embed")
                if spk is not None and np.asarray(spk).shape != (spk_dim,):
                    # a malformed spk vector would otherwise raise a numpy
                    # broadcast error inside the BATCHED dispatch, failing
                    # every co-batched request
                    raise ValueError(
                        f"spk_embed must have shape ({spk_dim},); got "
                        f"{np.asarray(spk).shape}"
                    )
                it["_prepped"] = self.synth.prepare_text(
                    it["text"], it.get("lang", "yue"), it.get("phone")
                )
                ok.append(req)
            except Exception as e:  # noqa: BLE001 — per-request isolation
                self._fail([req], e)
        return ok

    def _dispatch_sub(self, sub: List[_Request], finals, ok_group,
                      defer_long=None) -> None:
        """Dispatch one subgroup, isolating per-request failures: over-long
        items (cloning included — the long path grafts prompts since
        round 4) are rerouted onto the caller's long-form list
        (synthesize_long has no 15000-frame cap) and the innocent rest
        re-dispatched; a noise-cap group is
        SPLIT (prompt items re-dispatched in their own group, where the mel
        bucket is their own longest item) and only fails requests the cap
        applies to intrinsically."""
        from jyutvoice_tpu.pipeline.synthesize import (
            NoiseBufferExceeded,
            OverLongBatchItems,
        )

        work = [list(sub)]
        while work:
            attempt = work.pop()
            if not attempt:
                continue
            try:
                finals.append(
                    self.synth.synthesize_batch_dispatch(
                        [r.item for r in attempt],
                        n_timesteps=self.n_timesteps,
                        length_scale=self.length_scale,
                        return_mel=self.return_mel,
                        pcm16=self.pcm16,
                    )
                )
                ok_group.extend(attempt)
                self.stats.dispatches += 1
            except OverLongBatchItems as e:
                # the dispatcher identifies exactly which items exceeded
                # the batch mel table — reroute prompt-free culprits
                # through the long-form path (no cap there; e.g. a large
                # engine length_scale can push an interactive-length text
                # past 15000 frames), fail cloning culprits, retry the rest
                culprit_ids = {id(attempt[i]) for i in e.indices}
                culprits = [r for r in attempt if id(r) in culprit_ids]
                if defer_long is not None:
                    # cloning culprits reroute too since round 4: the long
                    # path grafts prompts into its fixed 512-frame head
                    defer_long.extend(culprits)
                    culprits = []
                if culprits:
                    self._fail(culprits, e)
                work.append(
                    [r for r in attempt if id(r) not in culprit_ids]
                )
            except NoiseBufferExceeded as e:
                # prompt bucket + mel bucket past the noise buffer is a
                # GROUP property (mel bucket = the longest co-batched
                # item): a short cloning request is innocent when a long
                # prompt-free item inflated the bucket — re-dispatch each
                # half in its own group. Only a prompt group that exceeds
                # the cap on its OWN mel bucket fails (rest empty on the
                # re-attempt).
                prompts = [
                    r for r in attempt
                    if r.item.get("prompt_feat") is not None
                ]
                rest = [
                    r for r in attempt
                    if r.item.get("prompt_feat") is None
                ]
                if prompts and rest:
                    work.append(rest)
                    work.append(prompts)
                else:
                    self._fail(attempt, e)
            except Exception as e:  # noqa: BLE001
                self._fail(attempt, e)

    def _finalize(self, group: List[_Request], finalize) -> None:
        try:
            results = finalize()
        except Exception as e:  # noqa: BLE001 — propagate per-request
            self._fail(group, e)
            return
        t_end = time.perf_counter()
        self.stats.batches += 1
        self.stats.batch_sizes.append(len(group))
        for req, res in zip(group, results):
            self.stats.requests += 1
            self.stats.total_latency_s += t_end - req.t_submit
            self._resolve(req.future, req.future.set_result, res)

    def _run(self) -> None:
        # double-buffered: group N is dispatched to the device before group
        # N-1's results are read back, so host transfer (the dominant cost
        # over a tunneled link) overlaps device compute.
        pending = None  # (group, finalize)
        while not self._stop.is_set():
            if pending is not None and self._q.empty():
                self._finalize(*pending)
                pending = None
                continue
            group = self._collect()
            if not group:
                if pending is not None:
                    self._finalize(*pending)
                    pending = None
                continue
            t_start = time.perf_counter()
            for req in group:
                self.stats.total_wait_s += t_start - req.t_submit
            group = self._validate(group)
            if not group:
                continue
            # groups past the batch-8 scaling knee are dispatched as
            # back-to-back sub-batches of <= split_dispatch_at: measured
            # (scripts/profile_split_dispatch.py) two overlapped batch-8
            # solves finish in 395 ms where one batch-16 takes 541 ms
            # (415 vs 303 xRT) — the device pipelines the dispatches, the
            # host fences once
            sd = self.split_dispatch_at
            # partition by text-length bucket first: the group's mel bucket
            # is its LONGEST item's, so one long-form request co-batched
            # with short ones would pad every item to the long bucket
            # (quadratic attention: ~100x extra compute for the short
            # requests once TEXT_BUCKETS allows multi-minute texts). Items
            # within 2x of the partition's shortest text bucket still
            # share a dispatch (bucket padding absorbs that much cheaply).
            # long-form requests (text past the interactive
            # buckets) each route through the one-pass long path: flash
            # attention + windowed vocoder + no 15000-frame cap (a >5 min
            # request would otherwise fail at the mel bucket table — and
            # co-batching two of them would fail BOTH, so every long
            # request routes individually, not just singletons)

            long_reqs = [
                r for r in group
                if r.item["_prepped"][2] > bkt.INTERACTIVE_TEXT_CAP
            ]
            long_ids = {id(r) for r in long_reqs}
            group = [r for r in group if id(r) not in long_ids]
            finals, ok_group = [], []
            if not group:
                subgroups = []
            else:
                group.sort(key=lambda r: r.item["_prepped"][2])
                parts, cur = [], [group[0]]
                for r in group[1:]:
                    if r.item["_prepped"][2] > 2 * cur[0].item["_prepped"][2]:
                        parts.append(cur)
                        cur = [r]
                    else:
                        cur.append(r)
                parts.append(cur)
                subgroups = [
                    part[i : i + sd]
                    for part in parts
                    for i in range(0, len(part), sd)
                ]
            # this group's short work is ASYNC-dispatched first (it queues
            # behind nothing and overlaps any long solve below), then the
            # PREVIOUS group's already-computed results are released — only
            # then do the synchronous long solves run, each resolving its
            # own request the moment its readback lands (parking a realized
            # long result in `pending` would delay it until the next
            # collected group)
            for sub in subgroups:
                # long_reqs is consumed AFTER this loop: items the batch
                # dispatcher rejects as over-long (prompt-free) are
                # appended to it and served by the long path below
                self._dispatch_sub(sub, finals, ok_group, long_reqs)
            if pending is not None:
                self._finalize(*pending)
                pending = None
            for req in long_reqs:
                try:
                    res = self.synth.synthesize_long(
                        req.item["text"],
                        lang=req.item.get("lang", "yue"),
                        phone=req.item.get("phone"),
                        spk_embed=req.item.get("spk_embed"),
                        prompt_feat=req.item.get("prompt_feat"),
                        prompt_h=req.item.get("prompt_h"),
                        mesh=self.sp_mesh,
                        sp_attention=self.sp_attention,
                        attention=(
                            self.long_attention if self.sp_mesh is None
                            else "auto"
                        ),
                        n_timesteps=self.n_timesteps,
                        length_scale=self.length_scale,
                        pcm16=self.pcm16,
                        dequantize=False,
                        return_mel=self.return_mel,
                        prepped=req.item["_prepped"],
                    )
                    self.stats.dispatches += 1
                    self._finalize([req], lambda r=res: [r])
                except Exception as e:  # noqa: BLE001
                    self._fail([req], e)
            if finals:

                def finalize(fins=tuple(finals)):
                    results = []
                    for f in fins:
                        results.extend(f())
                    return results

            else:
                finalize = None
            pending = (ok_group, finalize) if finalize is not None else None
        if pending is not None:
            self._finalize(*pending)


class _StreamHandle:
    """Client side of a streaming request: iterate to receive wav chunks.

    cancel() tells the lane to stop decoding this stream: the session's
    slot frees at the next worker pass and no further chunks are buffered
    — without it an abandoned client (HTTP disconnect) would keep a slot
    busy and accumulate the whole remaining utterance in _q."""

    _DONE = object()

    def __init__(self):
        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._cancelled = threading.Event()

    def cancel(self) -> None:
        self._cancelled.set()

    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()

    def __iter__(self):
        return self.iter_timeout(None)

    def iter_timeout(self, timeout=None):
        """Chunk iterator with a per-chunk wait bound: a wedged or dead
        lane worker raises TimeoutError instead of blocking the consumer
        thread forever (the HTTP layer uses this with its request
        timeout)."""
        while True:
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(
                    f"no stream chunk within {timeout} s (lane wedged or "
                    "overloaded)"
                ) from None
            if item is _StreamHandle._DONE:
                return
            if isinstance(item, Exception):
                raise item
            yield item


class StreamingLane:
    """Multi-session streaming lane: N live streams share ONE device
    dispatch and one readback per tick (pipeline/streaming.py
    MultiStreamSynthesizer), instead of N sequential single-stream loops
    paying N tunnel RTTs per audio tick.

    submit() returns an iterable of 24 kHz float32 wav chunks. Sessions
    beyond `max_streams` queue until a slot frees.

    Cloning prompts: build the lane with `prompt_frames` > 0 (a
    PROMPT_BUCKETS value) and pass prompt_feat/prompt_h to submit().
    Prompt-free sessions share the same compiled slot graph (their prompt
    region is masked), so cloning and plain streams co-tick — but every
    tick then computes the prompt-extended segment, so a prompt-capable
    lane costs ~(p + overlap + chunk)/(overlap + chunk) more per tick;
    keep prompt_frames=0 when cloning streams aren't served.
    """

    def __init__(
        self,
        synthesizer,
        max_streams: int = 4,
        chunk_frames: int = 100,
        n_timesteps: int = 10,
        pcm16: bool = False,
        prompt_frames: int = 0,
    ):
        from jyutvoice_tpu.pipeline.streaming import MultiStreamSynthesizer

        self.synth = synthesizer
        self.chunk_frames = chunk_frames
        self.n_timesteps = n_timesteps
        self.prompt_frames = prompt_frames
        # samples per EMITTED mel frame: the vocoder's total upsample, not
        # the analysis hop (they only coincide at 480 in the stock config;
        # streaming.py keys all chunk slicing off this — the y_len sample
        # budget must use the same unit or the stream trims early/late)
        self._spf = synthesizer.cfg.hift.total_upsample
        self._ms = MultiStreamSynthesizer(
            synthesizer.cfg, synthesizer.params_tts, synthesizer.params_hift,
            max_sessions=max_streams, chunk_frames=chunk_frames,
            n_timesteps=n_timesteps, pcm16=pcm16,
            prompt_frames=prompt_frames,
        )
        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._handles = {}  # sid -> (_StreamHandle, remaining_samples)
        self._stop = threading.Event()
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(
            target=self._run, name="jyutvoice-streaming", daemon=True
        )
        self._worker.start()

    def submit(
        self,
        text: str,
        lang: str = "yue",
        phone: Optional[str] = None,
        spk_embed: Optional[np.ndarray] = None,
        length_scale: float = 1.0,
        prompt_feat: Optional[np.ndarray] = None,
        prompt_h: Optional[np.ndarray] = None,
    ) -> _StreamHandle:
        # validate the prompt HERE (caller's thread) so the error surfaces
        # at submit time instead of inside the lane worker (open() also
        # raises on an over-capacity prompt, but that would fail the tick)
        if prompt_feat is not None:
            if self.prompt_frames == 0:
                raise ValueError(
                    "this streaming lane was built without prompt capacity"
                    " (prompt_frames=0); rebuild it with prompt_frames set"
                    " to a PROMPT_BUCKETS value to stream cloning requests"
                )
            if prompt_h is None:
                raise ValueError("prompt_feat requires prompt_h")
            if prompt_feat.shape[0] > self.prompt_frames:
                raise ValueError(
                    f"cloning prompt is {prompt_feat.shape[0]} frames, past"
                    f" this lane's {self.prompt_frames}-frame capacity —"
                    " trim the reference audio or raise prompt_frames"
                )
        handle = _StreamHandle()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("streaming lane is closed")
            self._q.put(
                (handle, dict(text=text, lang=lang, phone=phone,
                              spk_embed=spk_embed, length_scale=length_scale,
                              prompt_feat=prompt_feat, prompt_h=prompt_h))
            )
        return handle

    def close(self, timeout: float = 30.0) -> None:
        with self._submit_lock:
            self._stop.set()
            self._q.put(None)
        self._worker.join(timeout)
        # drain queued-but-never-admitted requests. _handles teardown
        # belongs to the WORKER's exit path: a cold-compile tick can
        # overrun the join budget, and mutating _handles here while the
        # live worker pops/reassigns entries would race ("dictionary
        # changed size during iteration" / chunks pushed into dead handles)
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[0]._q.put(RuntimeError("streaming lane is closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker --------------------------------------------------------------

    def _admit(self, block: bool) -> None:
        """Open queued requests into free slots; per-request failures fail
        only that request's handle."""
        while self._ms.active < self._ms.S:
            try:
                item = self._q.get(timeout=0.05) if block else self._q.get_nowait()
            except queue.Empty:
                return
            if item is None:
                return
            handle, req = item
            if handle.cancelled:
                # client gave up while queued — don't burn a slot on it
                handle._q.put(_StreamHandle._DONE)
                continue
            try:
                mu_y, c, y_len = self.synth.prepare_stream(
                    req["text"], lang=req["lang"], phone=req["phone"],
                    spk_embed=req["spk_embed"],
                    length_scale=req["length_scale"],
                )
                sid = self._ms.open(
                    mu_y, c, req.get("prompt_feat"), req.get("prompt_h")
                )
                self._handles[sid] = (handle, y_len * self._spf)
            except Exception as e:  # noqa: BLE001 — per-request isolation
                handle._q.put(e)
            block = False  # only block while completely idle

    def _reap_cancelled(self) -> None:
        """Free slots whose client cancelled (HTTP disconnect): close the
        session (drops its share of any in-flight dispatch) so the slot
        admits a waiting stream instead of decoding into an abandoned
        queue for the rest of the utterance."""
        for sid, (handle, _rem) in list(self._handles.items()):
            if handle.cancelled:
                self._ms.close(sid)
                del self._handles[sid]
                handle._q.put(_StreamHandle._DONE)

    def _run(self) -> None:
        while not self._stop.is_set():
            self._reap_cancelled()
            self._admit(block=self._ms.active == 0)
            if self._ms.active == 0:
                continue
            try:
                chunks, finished = self._ms.tick()
                for sid, wav in chunks.items():
                    handle, remaining = self._handles[sid]
                    emit = wav[: max(0, min(len(wav), remaining))]
                    if len(emit):
                        handle._q.put(emit)
                    self._handles[sid] = (handle, remaining - len(emit))
                for sid in finished:
                    handle, _rem = self._handles.pop(sid)
                    handle._q.put(_StreamHandle._DONE)
            except Exception as e:  # noqa: BLE001 — device/tunnel failure:
                # fail the affected streams but keep the lane alive for new
                # submits (a dead worker would hang every future client)
                for handle, _rem in self._handles.values():
                    handle._q.put(e)
                self._handles.clear()
                self._ms.reset()
        # worker exit: this thread owns _handles (close() only drains the
        # submit queue) — fail whatever streams are still live
        for handle, _rem in self._handles.values():
            handle._q.put(RuntimeError("streaming lane is closed"))
        self._handles.clear()
