"""Persistent compilation cache wiring (utils/jaxcache.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from avsum_tpu.utils.jaxcache import enable_compilation_cache


def test_enable_points_jax_at_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("AVSUM_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla")
    got = enable_compilation_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d

    # a fresh compile of a cache-eligible program still works end-to-end
    @jax.jit
    def f(x):
        return (x @ x.T).sum()

    x = jnp.asarray(np.random.default_rng(0).random((16, 16), np.float32))
    assert np.isfinite(float(f(x)))


def test_env_off_disables(tmp_path, monkeypatch):
    monkeypatch.setenv("AVSUM_COMPILE_CACHE", "off")
    assert enable_compilation_cache(str(tmp_path / "never")) is None
    assert not os.path.exists(str(tmp_path / "never"))


def test_env_relocates(tmp_path, monkeypatch):
    d = str(tmp_path / "relocated")
    monkeypatch.setenv("AVSUM_COMPILE_CACHE", d)
    assert enable_compilation_cache() == d
    assert os.path.isdir(d)
