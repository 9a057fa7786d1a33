"""Mesh construction + config system tests."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from avsum_tpu.parallel import (
    AXIS_DATA,
    AXIS_SEQ,
    MeshConfig,
    batch_spec,
    build_mesh,
    shard_batch,
)
from avsum_tpu.train import Config, load_config


def test_mesh_auto_data_absorbs_devices():
    mesh = build_mesh(MeshConfig(seq=2, model=1))
    assert mesh.shape[AXIS_DATA] == len(jax.devices()) // 2
    assert mesh.shape[AXIS_SEQ] == 2


def test_mesh_rejects_nondividing_shape():
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(seq=3, model=1))  # 3 doesn't divide 8


def test_batch_spec_shapes():
    assert batch_spec(3) == P(AXIS_DATA, AXIS_SEQ, None)
    assert batch_spec(2, seq_axis=None) == P(AXIS_DATA, None)


def test_shard_batch_places_on_mesh(mesh8):
    x = np.zeros((8, 16, 4), np.float32)
    y = shard_batch(x, mesh8)
    assert isinstance(y.sharding, NamedSharding)
    assert y.sharding.spec == P(AXIS_DATA, AXIS_SEQ, None)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_config_defaults_and_overrides(tmp_path):
    cfg = load_config(overrides=["train.lr=3e-4", "model.hidden_dim=256"])
    assert cfg.train.lr == pytest.approx(3e-4)
    assert cfg.model.hidden_dim == 256
    assert cfg.model.audio_dim == 296  # SURVEY §8.1 contract
    assert cfg.model.visual_dim == 4096


def test_config_yaml_roundtrip(tmp_path):
    from avsum_tpu.train.config import save_config

    cfg = load_config(overrides=["data.dataset=summe"])
    path = tmp_path / "cfg.yaml"
    save_config(cfg, str(path))
    loaded = load_config(str(path))
    assert loaded == cfg


def test_config_rejects_unknown_key():
    with pytest.raises(KeyError):
        load_config(overrides=["train.bogus=1"])
