"""Profiling + logging utility tests."""

import json
import time

import jax.numpy as jnp
import numpy as np

from avsum_tpu.utils import JsonlLogger, Timer, annotate, timed
from avsum_tpu.utils.profiling import trace_to


def test_timer_accumulates_and_blocks():
    t = Timer()
    with t.time("sleep"):
        time.sleep(0.02)
    with t.time("sleep"):
        time.sleep(0.02)
    s = t.summary()
    assert s["sleep"]["count"] == 2
    assert s["sleep"]["total_s"] >= 0.04


def test_timer_measure_returns_result():
    t = Timer()
    out, dt = t.measure("sum", lambda x: jnp.sum(x), jnp.ones(128))
    assert float(out) == 128.0
    assert dt >= 0


def test_annotate_and_timed_passthrough():
    @timed("myfn")
    def f(x):
        return x + 1

    with annotate("region"):
        assert f(1) == 2


def test_jsonl_logger_writes_records(tmp_path):
    path = str(tmp_path / "log.jsonl")
    with JsonlLogger(path) as logger:
        logger.log(1, loss=0.5, tag="a")
        logger.log(2, loss=np.float32(0.25))
    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[0]["tag"] == "a"
    assert lines[1]["loss"] == 0.25
    assert "time" in lines[1]


def test_jsonl_logger_no_path_is_noop():
    logger = JsonlLogger(None)
    rec = logger.log(0, loss=1.0)
    assert rec["loss"] == 1.0
    logger.close()


def test_trace_to_produces_files(tmp_path):
    import os

    with trace_to(str(tmp_path)):
        _ = jnp.sum(jnp.ones(64)).block_until_ready()
    # a plugins/ or .trace file tree should exist
    found = any(os.scandir(str(tmp_path)))
    assert found


def test_top_level_lazy_exports():
    import avsum_tpu

    assert callable(avsum_tpu.load_config)
    assert callable(avsum_tpu.make_model)
    assert "AVPipeline" in dir(avsum_tpu)
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        avsum_tpu.does_not_exist
