"""Serving robustness: admission control, timeouts, cancellation, media root.

Unit-level (stub pipeline, no HTTP socket, no compiles): the behaviors under
test — 429 backpressure, 504 deadlines, abandoned-request skipping, 403 path
containment — all live in ``SummarizeServer.handle_summarize`` and the worker
loop, which these tests drive directly. The HTTP layer is covered by
tests/test_serve.py. Extends the reference's per-item isolation
(/root/reference/scripts/preprocess.py:60-85) to the serving surface.
"""

import threading
import time

import pytest

from avsum_tpu.serve import ServeConfig, SummarizeServer
from avsum_tpu.train.config import load_config

pytestmark = pytest.mark.slow  # integration module: fixtures alone cost 15-50s


class _StubPipeline:
    """Pipeline double: begin() optionally blocks, finisher returns a
    minimal summarize payload."""

    def __init__(self, begin_delay=0.0, finish_delay=0.0):
        self.begin_delay = begin_delay
        self.finish_delay = finish_delay
        self.started = []

    def summarize_begin(self, path, model, params, budget):
        self.started.append(path)
        if self.begin_delay:
            time.sleep(self.begin_delay)

        def finish():
            if self.finish_delay:
                time.sleep(self.finish_delay)
            return {
                "video_id": "stub",
                "n_frames": 10,
                "fps": 1.0,
                "segments": [(0, 2)],
                "scores": [0.5],
            }

        return finish


@pytest.fixture()
def make_server(tmp_path):
    """Build a worker-only server (no HTTP socket) around a stub pipeline."""
    servers = []

    def _make(stub, **serve_kw):
        cfg = load_config(overrides=["visual.backbone=tiny"])
        srv = SummarizeServer(cfg, ServeConfig(warmup=False, **serve_kw))
        srv.pipeline = stub
        srv._ready.set()
        srv._running = True
        srv._worker = threading.Thread(target=srv._worker_loop, daemon=True)
        srv._worker.start()
        servers.append(srv)
        return srv

    yield _make
    for srv in servers:
        srv._running = False
        srv._worker.join(timeout=10)


@pytest.fixture()
def video(tmp_path):
    p = tmp_path / "clip.y4m"
    p.write_bytes(b"stub")  # existence is all the stub pipeline needs
    return str(p)


def test_media_root_containment(make_server, tmp_path, video):
    root = tmp_path / "media"
    root.mkdir()
    inside = root / "ok.y4m"
    inside.write_bytes(b"stub")
    srv = make_server(_StubPipeline(), media_root=str(root))
    # outside the root: uniform 403 whether or not the path exists
    code, _ = srv.handle_summarize(video)
    assert code == 403
    code, _ = srv.handle_summarize(str(root / ".." / "clip.y4m"))
    assert code == 403, "realpath traversal must not escape the root"
    code, _ = srv.handle_summarize("/etc/passwd")
    assert code == 403
    code, _ = srv.handle_summarize(str(root / "missing.y4m"))
    assert code == 404  # inside the root: normal handling
    code, _ = srv.handle_summarize(str(inside))
    assert code == 200


def test_flood_gets_429_not_unbounded_queue(make_server, video):
    """With the worker wedged, admission control bounds the queue."""
    stub = _StubPipeline(begin_delay=1.0)
    srv = make_server(stub, max_queue=2)
    results = []

    def call():
        results.append(srv.handle_summarize(video))

    threads = [threading.Thread(target=call) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    codes = sorted(c for c, _ in results)
    assert codes.count(429) >= 4, codes  # flood rejected, not queued
    assert all(c in (200, 429) for c in codes), codes
    assert srv._stats["rejected"] >= 4
    # the worker survived the flood and still serves
    code, _ = srv.handle_summarize(video)
    assert code == 200


def test_slow_request_times_out_504_and_is_skipped(make_server, video):
    """A queued request past its deadline returns 504; the worker then
    skips it instead of burning pipeline time."""
    stub = _StubPipeline(begin_delay=1.5)
    srv = make_server(stub, request_timeout_s=0.3)
    # first request occupies the worker inside begin(); the second times
    # out while still queued
    t1 = threading.Thread(target=srv.handle_summarize, args=(video,))
    t1.start()
    time.sleep(0.2)  # ensure req1 is in begin()
    t0 = time.perf_counter()
    code, payload = srv.handle_summarize(video)
    waited = time.perf_counter() - t0
    assert code == 504, payload
    assert waited < 1.2  # returned at its own deadline, not req1's pace
    t1.join(timeout=30)
    # the worker marks the abandoned request cancelled once it reaches it
    deadline = time.time() + 10
    while time.time() < deadline and srv._stats["cancelled"] < 1:
        time.sleep(0.05)
    assert srv._stats["cancelled"] >= 1
    assert len(stub.started) == 1, "abandoned request must not start"


def test_client_disconnect_cancels_queued_request(make_server, video):
    stub = _StubPipeline(begin_delay=1.0)
    srv = make_server(stub)
    t1 = threading.Thread(target=srv.handle_summarize, args=(video,))
    t1.start()
    time.sleep(0.2)
    code, payload = srv.handle_summarize(video, disconnected=lambda: True)
    assert code == 499
    t1.join(timeout=30)
    deadline = time.time() + 10
    while time.time() < deadline and srv._stats["cancelled"] < 1:
        time.sleep(0.05)
    assert len(stub.started) == 1


def test_timeout_zero_means_no_deadline(make_server, video):
    srv = make_server(_StubPipeline(finish_delay=0.3), request_timeout_s=0.0)
    code, payload = srv.handle_summarize(video)
    assert code == 200, payload
