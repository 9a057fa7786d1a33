"""Production wiring of the Pallas kernels (VERDICT round-1 item 2).

The kernels must actually run in the default pipeline on TPU (auto mode),
stay off on CPU, be bit-compatible with the XLA paths they replace, and
never break training (the kernels are forward-only; training autodiffs the
XLA attention).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsum_tpu.ops import pallas_enabled
from avsum_tpu.train.config import AudioFeatConfig, ModelConfig


def test_pallas_enabled_resolution():
    assert pallas_enabled(True) is True
    assert pallas_enabled(False) is False
    # auto mode follows the backend (CPU in the test harness)
    assert pallas_enabled(None) == (jax.default_backend() == "tpu")


def test_default_audio_config_satisfies_kernel_constraint():
    cfg = AudioFeatConfig()
    # torchaudio parity (n_fft=400, hop=200) doubles as the fused kernel's
    # n_fft == 2*hop requirement — hop_length=160 would silently disable it
    assert cfg.n_fft == 2 * cfg.hop_length
    assert cfg.hop_length == 200


@pytest.mark.slow
def test_audio_frontend_pallas_matches_xla():
    from avsum_tpu.audio.frontend import AudioFrontend

    cfg = AudioFeatConfig()
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(16000).astype(np.float32)
    bounds = np.array([[0, 8000], [8000, 16000]], np.float64)

    base = AudioFrontend(cfg, seed=0, use_pallas=False)
    fused = AudioFrontend(cfg, seed=0, use_pallas=True)  # interpret on CPU
    assert fused.use_pallas
    a = np.asarray(base.shot_features(wave, bounds))
    b = np.asarray(fused.shot_features(wave, bounds))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_audio_frontend_warns_on_unsatisfiable_explicit_flag():
    from avsum_tpu.audio.frontend import AudioFrontend

    cfg = AudioFeatConfig(hop_length=160)  # breaks n_fft == 2*hop
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        fe = AudioFrontend(cfg, seed=0, use_pallas=True)
    assert not fe.use_pallas
    assert any("n_fft == 2*hop_length" in str(w.message) for w in caught)


@pytest.fixture(scope="module")
def tiny_inputs():
    # S >= 512: the flash kernel only dispatches for long sequences (short
    # ones are strictly cheaper on the XLA path)
    rng = np.random.default_rng(1)
    b, s = 1, 520
    visual = rng.standard_normal((b, s, 64)).astype(np.float32)
    audio = rng.standard_normal((b, s, 32)).astype(np.float32)
    mask = np.ones((b, s), np.float32)
    mask[0, 500:] = 0.0
    return visual, audio, mask


def _tiny_model(use_pallas):
    from avsum_tpu.models import make_model

    cfg = ModelConfig(
        visual_dim=64, audio_dim=32, hidden_dim=32, scorer_hidden=8,
        num_heads=2, use_pallas=use_pallas,
    )
    return make_model(cfg)


def test_scorer_pallas_inference_matches_xla(tiny_inputs):
    visual, audio, mask = tiny_inputs
    rng = jax.random.PRNGKey(0)
    m_off = _tiny_model(False)
    m_on = _tiny_model(True)  # interpret mode on CPU
    params = m_off.init(rng, visual, audio, mask)["params"]
    s_off = np.asarray(m_off.apply({"params": params}, visual, audio, mask))
    s_on = np.asarray(m_on.apply({"params": params}, visual, audio, mask))
    np.testing.assert_allclose(s_off, s_on, rtol=2e-4, atol=2e-4)
    # padded positions still masked out
    assert np.all(s_on[0, 500:] == 0.0)


@pytest.mark.slow
def test_scorer_pallas_flag_does_not_break_training_grad(tiny_inputs):
    """use_pallas=True must not leak into the autodiff path: training runs
    with deterministic=False, where the XLA attention is always used."""
    visual, audio, mask = tiny_inputs
    rng = jax.random.PRNGKey(0)
    model = _tiny_model(True)
    params = model.init(rng, visual, audio, mask)["params"]

    def loss_fn(p):
        scores = model.apply(
            {"params": p}, visual, audio, mask,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.mean((scores - 0.5) ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(np.abs(np.asarray(g)).sum()) > 0 for g in flat)


def test_scorer_flash_dispatch_rule(monkeypatch, tiny_inputs):
    """Flash dispatches for long sequences only: the kernel pads S to its
    512 blocks, so short videos stay on the (cheaper) XLA attention."""
    import avsum_tpu.ops as ops

    calls = []
    orig = ops.flash_attention

    def spy(q, k, v, mask=None):
        calls.append(tuple(q.shape))
        return orig(q, k, v, mask=mask)

    monkeypatch.setattr(ops, "flash_attention", spy)
    rng = jax.random.PRNGKey(0)
    model = _tiny_model(True)

    visual, audio, mask = tiny_inputs  # S=520 -> dispatches
    params = model.init(rng, visual, audio, mask)["params"]
    calls.clear()
    model.apply({"params": params}, visual, audio, mask)
    assert calls, "flash attention not dispatched for S>=512"

    calls.clear()
    short = (visual[:, :16], audio[:, :16], mask[:, :16])
    model.apply({"params": params}, *short)
    assert not calls, "flash attention dispatched for a short sequence"
