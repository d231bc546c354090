"""Host/device pipelined inter mode-decision search.

The reference runs 13 concurrent stage kernels connected by FIFOs
(enc_handle.c:2254-2316); the TPU build's SRM graph collapses to two
stages: an open-loop device search (this worker) and the host commit walk.
The worker thread dispatches whole chunks (a mini-GoP or a lookahead
group) to the TPU as ONE batched transfer + async program queue
(ops/inter_search.chunk_search) while the main thread commits previously
searched frames -- the search/commit overlap the reference gets from its
MD/EncDec thread array.

Device time is accounted where it is actually spent: the worker's
blocking span around each chunk is bracketed with the "device:"
profiling stage that bench.py reports as device_frac.
"""

from __future__ import annotations

import queue
import threading
import traceback

import numpy as np

from ..profiling import stage


class InterSearchPipeline:
    """One background worker feeding open-loop decision rows to commits.

    submit(chunk_id, frames, jobs) enqueues a chunk; get(key) blocks until
    that frame's result is ready (returns None on worker failure so the
    caller falls back to the native search path).
    """

    def __init__(self, bd: int = 8, shapes=((8, 8), (16, 16), (32, 32),
                                             (64, 64))):
        enable_compile_cache()
        self.bd = int(bd)
        self.shapes = tuple((int(w), int(h)) for (w, h) in shapes)
        self._q: queue.Queue = queue.Queue()
        self._results: dict = {}
        self._events: dict = {}
        self._lock = threading.Lock()
        self._failed = False
        self._thread = threading.Thread(
            target=self._worker, name="inter-search", daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- API
    def available(self) -> bool:
        return not self._failed

    def warm(self, h: int, w: int):
        """Pre-compile the search programs for (h, w) frames off the
        critical path (both one- and two-reference variants)."""
        z = np.zeros((h, w), np.uint8 if self.bd == 8 else np.uint16)
        jobs = [dict(key=None, src=0, ref_l=1, ref_a=2, gm=(0, 0),
                     lam=20.0, psy_rd=0.0, bias_pct=100.0),
                dict(key=None, src=1, ref_l=0, ref_a=None, gm=(0, 0),
                     lam=20.0, psy_rd=0.0, bias_pct=100.0)]
        self._q.put(([z, z, z], jobs))

    def submit(self, frames, jobs):
        """frames: list of (h, w) source planes; jobs: list of dicts with
        keys {key, src, ref_l, ref_a, gm, lam, psy_rd, bias_pct} where
        src/ref_* index into `frames` and `key` is the caller's handle."""
        with self._lock:
            for j in jobs:
                if j["key"] is not None:
                    self._events[j["key"]] = threading.Event()
        self._q.put((frames, jobs))

    def get(self, key, timeout: float = 600.0):
        """Block until `key`'s decision rows arrive. Returns the
        {depth: (rows, costs)} dict, or None (failed / unknown key)."""
        with self._lock:
            ev = self._events.get(key)
        if ev is None:
            return None
        ev.wait(timeout)
        with self._lock:
            self._events.pop(key, None)
            return self._results.pop(key, None)

    def drain(self):
        """Testing/shutdown helper: wait until the queue is empty."""
        self._q.join()

    # ----------------------------------------------------------- worker
    def _worker(self):
        while True:
            frames, jobs = self._q.get()
            try:
                if not self._failed:
                    with stage("device:inter_search"):
                        self._run_chunk(frames, jobs)
                else:
                    self._post(jobs, None)
            except Exception:
                traceback.print_exc()
                self._failed = True
                self._post(jobs, None)
            finally:
                self._q.task_done()

    def _run_chunk(self, frames, jobs):
        from ..ops import inter_search as dev

        def post(j, res):
            key = jobs[j]["key"]
            if key is None:
                return
            with self._lock:
                self._results[key] = res
                ev = self._events.get(key)
                if ev is not None:
                    ev.set()

        dev.chunk_search(frames, jobs, self.bd, self.shapes, post=post)

    def _post(self, jobs, value):
        with self._lock:
            for j in jobs:
                if j["key"] is not None:
                    self._results[j["key"]] = value
                    ev = self._events.get(j["key"])
                    if ev is not None:
                        ev.set()


_CACHE_SET = False


def enable_compile_cache(path: str = "/tmp/svt_av1_tpu_jax_cache"):
    """Persistent XLA compilation cache: the staged search programs
    compile once per (dims, depth) configuration ever, not once per
    process (first compile is ~45 s at 480p)."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # the commit-group programs (ops/commit.py) compile in ~1-4s each
        # but there are dozens of (shape, bucket) variants; persisting them
        # all pays off from the second process on
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_PIPELINE = None


def get_pipeline(bd: int = 8, depths=(8, 16, 32, 64), rect: bool = False):
    """Process-wide singleton (one device queue; encoder sessions share)."""
    from ..ops.inter_search import shapes_for

    global _PIPELINE
    shapes = shapes_for(tuple(depths), rect)
    if (_PIPELINE is None or _PIPELINE._failed or _PIPELINE.bd != bd
            or _PIPELINE.shapes != shapes):
        _PIPELINE = InterSearchPipeline(bd=bd, shapes=shapes)
    return _PIPELINE


def device_backend_default() -> bool:
    """True when a real accelerator is attached (the device search beats
    the host C search only when the batched programs run on TPU-class
    hardware; on CPU-only hosts the native backend stays the default)."""
    try:
        import jax

        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False
