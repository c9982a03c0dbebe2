"""Serving liveness: no request may hang forever (VERDICT r4 #3).

This environment's documented backend failure mode is a HANG, not an
exception (CLAUDE.md: axon calls can wedge). These tests inject a
blocking engine and pin the liveness contract end-to-end:

- a wedged device call trips the per-call watchdog: the hung GROUP fails
  with ``DeviceHangError`` (HTTP 503), the dispatcher survives, and the
  NEXT request succeeds;
- ``submit`` has its own end-to-end deadline (``RequestTimeoutError``)
  even when the device watchdog is disabled;
- the hang count is observable via the batcher snapshot (/stats).

Pure threading tests against a stub engine — no device, no jit.
"""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from one_to_many_gan_tpu.serve import (
    DeviceHangError,
    RequestTimeoutError,
    _Batcher,
    make_server,
)

SIZE = 4


class StubEngine:
    """Engine double: instant results, except calls flagged to wedge."""

    batch_buckets = (1, 2, 4)
    buckets = (4, 8)
    image_size = (SIZE, SIZE)
    channels = 1
    step = 0
    ema = False
    data_parallel = 1
    int8 = False

    def __init__(self, hang_calls=()):
        self.calls = 0
        self.hang_calls = set(hang_calls)  # 1-based call indices that wedge
        self.release = threading.Event()  # lets abandoned workers exit
        self.lock = threading.Lock()

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        msg = f"n={n} above the largest compiled bucket"
        raise ValueError(msg)

    def generate(self, src, n, *, seed=0, theta=1.0):  # noqa: ARG002
        return self.generate_batch([src], [n], [seed], [theta])[0]

    def generate_batch(self, srcs, ns, seeds, thetas):  # noqa: ARG002
        with self.lock:
            self.calls += 1
            call = self.calls
        if call in self.hang_calls:
            self.release.wait()  # the simulated wedged backend
        return [np.zeros((n, SIZE, SIZE, 1), np.uint8) for n in ns]


def test_hung_device_call_fails_group_dispatcher_survives():
    engine = StubEngine(hang_calls={1})
    batcher = _Batcher(engine, max_batch=2, window_ms=0.0,
                       device_timeout_s=0.3, request_timeout_s=10.0)
    try:
        src = np.zeros((SIZE, SIZE, 1), np.uint8)
        t0 = time.monotonic()
        with pytest.raises(DeviceHangError, match="watchdog"):
            batcher.submit(src, 4, 0, 1.0)
        assert time.monotonic() - t0 < 5.0  # bounded, not forever
        assert batcher.hangs == 1
        # the dispatcher survived the abandoned call: next request works
        out = batcher.submit(src, 4, 0, 1.0)
        assert out.shape == (4, SIZE, SIZE, 1)
        assert batcher.snapshot()["hangs"] == 1
    finally:
        engine.release.set()
        batcher.close()


def test_submit_deadline_bounds_queued_requests():
    """Even with the device watchdog off, a client can never block
    forever: submit's own deadline fires while the call is wedged."""
    engine = StubEngine(hang_calls={1})
    batcher = _Batcher(engine, max_batch=2, window_ms=0.0,
                       device_timeout_s=0.0, request_timeout_s=0.3)
    try:
        src = np.zeros((SIZE, SIZE, 1), np.uint8)
        t0 = time.monotonic()
        with pytest.raises(RequestTimeoutError, match="timed out"):
            batcher.submit(src, 4, 0, 1.0)
        assert time.monotonic() - t0 < 5.0
    finally:
        engine.release.set()
        batcher.close()


def test_concurrent_clients_one_hang_times_out_rest_succeed():
    """The VERDICT r4 #3 acceptance test over real HTTP: one hung call
    503s; concurrent and subsequent requests still succeed; /stats
    reports the hang."""
    engine = StubEngine(hang_calls={1})
    httpd = make_server(engine, host="127.0.0.1", port=0, max_batch=2,
                        window_ms=0.0, device_timeout_s=0.5,
                        request_timeout_s=10.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    buf = io.BytesIO()
    Image.fromarray(np.zeros((SIZE, SIZE), np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()

    codes = []
    lock = threading.Lock()

    def client(i):
        req = urllib.request.Request(f"{base}/generate?n=4&seed={i}&format=npy",
                                     data=png)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                with lock:
                    codes.append(resp.status)
        except urllib.error.HTTPError as exc:
            with lock:
                codes.append(exc.code)

    try:
        # first request wedges (stub call #1); let it enter the device
        # call alone so the hang is deterministic, then pile two more on
        t1 = threading.Thread(target=client, args=(0,))
        t1.start()
        time.sleep(0.2)
        rest = [threading.Thread(target=client, args=(i,)) for i in (1, 2)]
        for t in rest:
            t.start()
        for t in [t1, *rest]:
            t.join(timeout=30)
        assert sorted(codes) == [200, 200, 503]
        with urllib.request.urlopen(f"{base}/stats", timeout=10) as resp:
            stats = json.loads(resp.read())
        assert stats["batching"]["hangs"] == 1
        assert stats["errors"] == 1
    finally:
        engine.release.set()
        httpd.shutdown()
        if httpd.batcher is not None:
            httpd.batcher.close()


def test_unbatched_path_has_watchdog_too():
    """max_batch=1 (no batcher): the handler thread's direct engine call
    is still bounded."""
    engine = StubEngine(hang_calls={1})
    httpd = make_server(engine, host="127.0.0.1", port=0, max_batch=1,
                        device_timeout_s=0.3)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    buf = io.BytesIO()
    Image.fromarray(np.zeros((SIZE, SIZE), np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()
    try:
        req = urllib.request.Request(f"{base}/generate?n=4&format=npy", data=png)
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 503
        # next request succeeds (stub call #2 doesn't hang)
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
    finally:
        engine.release.set()
        httpd.shutdown()


def test_watchdog_disabled_is_direct_call():
    from one_to_many_gan_tpu.serve import _call_with_watchdog

    assert _call_with_watchdog(lambda: 42, 0.0, "x") == 42
    with pytest.raises(ValueError, match="boom"):
        _call_with_watchdog(lambda: (_ for _ in ()).throw(ValueError("boom")),
                            5.0, "x")
