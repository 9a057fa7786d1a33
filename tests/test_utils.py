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


def test_example_configs_load_and_roundtrip(tmp_path):
    """Every in-tree example YAML loads into the real Config tree (the
    reference's yaml was never loaded, SURVEY.md §5.6) and survives a
    save/load roundtrip, including CLI-style overrides on top."""
    import glob
    import os

    from avsum_tpu.train.config import load_config, save_config, to_dict

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.yaml")))
    assert len(paths) >= 3, paths
    for path in paths:
        cfg = load_config(path)
        assert cfg.audio.feature_dim == 296  # contract survives every config
        out = str(tmp_path / os.path.basename(path))
        save_config(cfg, out)
        assert to_dict(load_config(out)) == to_dict(cfg)
        # overrides compose with file configs
        cfg2 = load_config(path, overrides=["train.lr=5e-4"])
        assert cfg2.train.lr == 5e-4

    tvsum = load_config(os.path.join(repo, "configs", "tvsum.yaml"))
    assert tvsum.data.dataset == "tvsum" and tvsum.train.epochs == 100
    hour = load_config(os.path.join(repo, "configs", "hour_scale.yaml"))
    assert hour.mesh.seq == 4 and hour.model.chunk_size == 512
