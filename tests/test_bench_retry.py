"""bench.py resilience: bounded retries on transient backend failures and
a diagnostic JSON line when retries are exhausted (round-3 failure mode:
one axon UNAVAILABLE at backend init erased the round's perf record)."""

import contextlib
import importlib.util
import io
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


@pytest.fixture()
def benchmod(monkeypatch):
    spec = importlib.util.spec_from_file_location("benchmod", _BENCH)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    monkeypatch.setattr(m, "_RETRY_SLEEPS_S", [0.0, 0.0])
    # never touch real jax backend state from the unit test
    monkeypatch.setattr(m, "_reset_jax_backends", lambda: None)
    return m


def test_transient_error_retried_until_success(benchmod):
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")
        return "ok"

    assert benchmod.with_backend_retry(flaky, "t") == "ok"
    assert len(calls) == 3


def test_non_transient_error_raises_immediately(benchmod):
    calls = []

    def bad():
        calls.append(1)
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        benchmod.with_backend_retry(bad, "t")
    assert len(calls) == 1


def test_exhausted_retries_reraise(benchmod):
    calls = []

    def always():
        calls.append(1)
        raise RuntimeError("UNAVAILABLE: tunnel down")

    with pytest.raises(RuntimeError):
        benchmod.with_backend_retry(always, "t")
    assert len(calls) == 1 + len(benchmod._RETRY_SLEEPS_S)


def test_error_json_is_one_parseable_line(benchmod):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        benchmod.emit_error_json(
            "backend_init", RuntimeError("UNAVAILABLE: tunnel down")
        )
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 1
    d = json.loads(lines[0])
    assert d["metric"] == "e2e_video_fps"
    assert d["value"] is None
    assert d["error_stage"] == "backend_init"
    assert "UNAVAILABLE" in d["error"]
