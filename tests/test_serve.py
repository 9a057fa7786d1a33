"""HTTP serving subsystem: endpoints, ordering, isolation, stats."""

import json
import os
import threading
from dataclasses import replace as dataclasses_replace
from http.client import HTTPConnection

import numpy as np
import pytest

from avsum_tpu.serve import ServeConfig, SummarizeServer
from avsum_tpu.train.config import load_config

pytestmark = pytest.mark.slow  # integration module: fixtures alone cost 15-50s


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.dtype=float32",
            "visual.sample_fps=2.0",
            "audio.silence_fallback=true",
        ]
    )
    srv = SummarizeServer(cfg, ServeConfig(port=0, warmup=True))
    srv.start(block=False)
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    from avsum_tpu.io.synthetic import write_scene_video

    stem = str(tmp_path_factory.mktemp("serve") / "clip")
    write_scene_video(
        stem, n_scenes=3, seed=5, fps=8.0, height=64, width=96,
        scene_len_frames=(10, 16),
    )
    return stem + ".y4m"


def _request(srv, method, path, body=None):
    conn = HTTPConnection("127.0.0.1", srv.port, timeout=300)
    try:
        conn.request(
            method, path, body=json.dumps(body) if body is not None else None
        )
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read() or b"{}")
    finally:
        conn.close()


def test_health_and_readiness(server):
    code, payload = _request(server, "GET", "/healthz")
    assert code == 200 and payload["status"] == "ok"
    server._ready.wait(timeout=300)
    code, payload = _request(server, "GET", "/readyz")
    assert code == 200 and payload["status"] == "ready"


def test_summarize_endpoint(server, video):
    code, payload = _request(server, "POST", "/v1/summarize", {"path": video})
    assert code == 200, payload
    assert payload["n_frames"] > 0
    assert len(payload["segments"]) >= 1
    assert len(payload["shot_scores"]) >= 1
    total = payload["n_frames"]
    summary_frames = sum(b - a for a, b in payload["segments"])
    assert summary_frames <= max(int(0.15 * total), payload["segments"][0][1] - payload["segments"][0][0])


def test_budget_override(server, video):
    code, full = _request(
        server, "POST", "/v1/summarize", {"path": video, "budget_fraction": 0.9}
    )
    assert code == 200
    frames_90 = sum(b - a for a, b in full["segments"])
    code, tight = _request(
        server, "POST", "/v1/summarize", {"path": video, "budget_fraction": 0.1}
    )
    assert code == 200
    frames_10 = sum(b - a for a, b in tight["segments"])
    assert frames_10 <= frames_90


def test_missing_video_is_404_and_isolated(server, video):
    code, payload = _request(
        server, "POST", "/v1/summarize", {"path": "/nope/missing.y4m"}
    )
    assert code == 404
    # the server keeps working after a failed request
    code, payload = _request(server, "POST", "/v1/summarize", {"path": video})
    assert code == 200


def test_bad_request_is_400(server):
    code, payload = _request(server, "POST", "/v1/summarize", {"nope": 1})
    assert code == 400


def test_unknown_path_is_404(server):
    code, _ = _request(server, "GET", "/nope")
    assert code == 404
    code, _ = _request(server, "POST", "/nope")
    assert code == 404


def test_stats_accumulate(server, video):
    code, before = _request(server, "GET", "/v1/stats")
    assert code == 200
    code, _ = _request(server, "POST", "/v1/summarize", {"path": video})
    assert code == 200
    code, after = _request(server, "GET", "/v1/stats")
    assert after["requests"] == before["requests"] + 1
    assert after["frames"] > before["frames"]
    assert after["latency_ewma_s"] > 0


def test_concurrent_requests_all_succeed(server, video):
    """FIFO device lock: parallel requests serialize safely, none fail."""
    results = [None] * 4

    def worker(i):
        results[i] = _request(
            server, "POST", "/v1/summarize", {"path": video}
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for code, payload in results:
        assert code == 200, payload
    scores = [tuple(p["shot_scores"]) for _, p in results]
    assert len(set(scores)) == 1  # deterministic across concurrent requests


def test_cli_serve_parser():
    """The serve subcommand parses (no server start needed)."""
    import argparse

    from avsum_tpu.cli.main import main

    with pytest.raises(SystemExit) as e:
        main(["serve", "--help"])
    assert e.value.code == 0


def test_sigterm_drains_and_exits(tmp_path):
    """A blocking `serve` process finishes queued work on SIGTERM, then
    exits cleanly (graceful drain)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from avsum_tpu.io.synthetic import write_scene_video

    import socket

    stem = str(tmp_path / "clip")
    write_scene_video(
        stem, n_scenes=2, seed=8, fps=8.0, height=64, width=96,
        scene_len_frames=(8, 12),
    )
    with socket.socket() as s:  # find a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, AVSUM_PLATFORM="cpu")
    errlog = open(str(tmp_path / "serve.err"), "w+")
    proc = subprocess.Popen(
        [sys.executable, "-m", "avsum_tpu.cli", "serve", "--port", str(port),
         "--set", "visual.backbone=tiny",
         "--set", "visual.dtype=float32",
         "--set", "audio.silence_fallback=true"],
        env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=errlog,
    )
    try:
        # readiness includes the warmup compiles of a fresh process
        deadline = time.time() + 420
        while time.time() < deadline:
            if proc.poll() is not None:
                errlog.seek(0)
                raise AssertionError(
                    f"server died rc={proc.returncode}:\n{errlog.read()[-2000:]}"
                )
            try:
                code, _ = _request_port(port, "GET", "/readyz")
                if code == 200:
                    break
            except OSError:
                pass
            time.sleep(1)
        else:
            errlog.seek(0)
            raise AssertionError(
                "server never became ready:\n" + errlog.read()[-2000:]
            )
        code, out = _request_port(
            port, "POST", "/v1/summarize", {"path": stem + ".y4m"}
        )
        assert code == 200
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def _request_port(port, method, path, body=None):
    conn = HTTPConnection("127.0.0.1", port, timeout=120)
    try:
        conn.request(
            method, path, body=json.dumps(body) if body is not None else None
        )
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read() or b"{}")
    finally:
        conn.close()


def test_access_log_records_requests(tmp_path, video):
    log_path = str(tmp_path / "access.jsonl")
    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.dtype=float32",
            "audio.silence_fallback=true",
        ]
    )
    srv = SummarizeServer(
        cfg, ServeConfig(port=0, warmup=False, access_log=log_path)
    )
    srv.start(block=False)
    try:
        srv._ready.wait(timeout=60)
        code, _ = _request(srv, "POST", "/v1/summarize", {"path": video})
        assert code == 200
        code, _ = _request(
            srv, "POST", "/v1/summarize", {"path": video, "budget_fraction": -1}
        )
    finally:
        srv.stop()
    lines = [json.loads(ln) for ln in open(log_path)]
    assert len(lines) >= 1
    ok = [ln for ln in lines if ln["code"] == 200]
    assert ok and ok[0]["path"] == video
    assert ok[0]["n_frames"] > 0 and ok[0]["latency_s"] > 0


def _raw_post(srv, path, body: bytes, headers=None):
    conn = HTTPConnection("127.0.0.1", srv.port, timeout=300)
    try:
        conn.request("POST", path, body=body, headers=headers or {})
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read() or b"{}")
    finally:
        conn.close()


def test_upload_endpoint(server, video):
    """POST /v1/summarize/upload: raw media body -> summary, temp file
    cleaned up afterwards."""
    import glob
    import tempfile

    server._ready.wait(timeout=300)
    blob = open(video, "rb").read()
    code, payload = _raw_post(server, "/v1/summarize/upload?ext=y4m", blob)
    assert code == 200, payload
    assert payload["n_frames"] > 0 and len(payload["segments"]) >= 1
    assert "video_id" not in payload  # temp name is meaningless to clients
    # same answer as the path-based endpoint
    code2, by_path = _request(server, "POST", "/v1/summarize", {"path": video})
    assert code2 == 200
    assert payload["segments"] == by_path["segments"]
    # no leaked temp files
    assert not glob.glob(os.path.join(tempfile.gettempdir(), "avsum_up_*"))


def test_upload_content_type_ext(server, video):
    blob = open(video, "rb").read()
    code, payload = _raw_post(
        server, "/v1/summarize/upload", blob,
        headers={"Content-Type": "application/vnd.y4m"},
    )
    assert code == 200, payload


def test_upload_rejections(server):
    # no extension hint
    code, payload = _raw_post(server, "/v1/summarize/upload", b"xx")
    assert code == 400 and "ext" in payload["error"]
    # over the size limit
    old = server.serve_config.max_upload_mb
    server.serve_config = dataclasses_replace(server.serve_config, max_upload_mb=0)
    try:
        code, payload = _raw_post(server, "/v1/summarize/upload?ext=y4m", b"xx")
        assert code == 404 and "disabled" in payload["error"]
    finally:
        server.serve_config = dataclasses_replace(server.serve_config, max_upload_mb=old)
    server.serve_config = dataclasses_replace(server.serve_config, max_upload_mb=1)
    try:
        big = b"\0" * (2 * 1024 * 1024)
        code, payload = _raw_post(server, "/v1/summarize/upload?ext=y4m", big)
        assert code == 413, payload
    finally:
        server.serve_config = dataclasses_replace(server.serve_config, max_upload_mb=old)
    # garbage body with a real ext: per-request isolation -> 4xx/5xx, not death
    code, payload = _raw_post(server, "/v1/summarize/upload?ext=y4m", b"junk")
    assert code in (400, 422, 500)
    code, _ = _request(server, "GET", "/healthz")
    assert code == 200
