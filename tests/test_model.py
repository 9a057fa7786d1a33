"""Model forward tests: shapes, dtypes, masking invariance, encoder variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsum_tpu.models import AVScorer, make_model
from avsum_tpu.train.config import ModelConfig

SMALL = ModelConfig(visual_dim=64, audio_dim=24, hidden_dim=32, scorer_hidden=16)


def _init_and_apply(cfg, b=2, s=10, seed=0):
    model = make_model(cfg)
    rng = jax.random.PRNGKey(seed)
    visual = jax.random.normal(rng, (b, s, cfg.visual_dim))
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (b, s, cfg.audio_dim))
    mask = jnp.ones((b, s))
    params = model.init(rng, visual, audio, mask)["params"]
    return model, params, visual, audio, mask


@pytest.mark.slow
@pytest.mark.parametrize("encoder", ["attention", "bilstm", "tcn"])
def test_forward_shapes_and_range(encoder):
    cfg = ModelConfig(
        visual_dim=64, audio_dim=24, hidden_dim=32, scorer_hidden=16,
        temporal_encoder=encoder,
    )
    model, params, visual, audio, mask = _init_and_apply(cfg)
    out = jax.jit(
        lambda p, v, a, m: model.apply({"params": p}, v, a, m)
    )(params, visual, audio, mask)
    assert out.shape == (2, 10)
    assert bool(jnp.all((out >= 0) & (out <= 1)))
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("encoder", ["attention", "bilstm", "tcn"])
def test_padding_invariance(encoder):
    """Scores at real positions must not change when padding is appended —
    the property the reference breaks by padding without masks
    (/root/reference/scripts/train.py:20-29)."""
    cfg = ModelConfig(
        visual_dim=32, audio_dim=16, hidden_dim=32, scorer_hidden=8,
        temporal_encoder=encoder,
    )
    model, params, visual, audio, _ = _init_and_apply(cfg, b=1, s=6)
    mask6 = jnp.ones((1, 6))
    out_ref = model.apply({"params": params}, visual, audio, mask6)

    pad = 4
    visual_p = jnp.pad(visual, ((0, 0), (0, pad), (0, 0)), constant_values=7.0)
    audio_p = jnp.pad(audio, ((0, 0), (0, pad), (0, 0)), constant_values=-3.0)
    mask_p = jnp.pad(mask6, ((0, 0), (0, pad)))
    out_pad = model.apply({"params": params}, visual_p, audio_p, mask_p)

    np.testing.assert_allclose(
        np.asarray(out_pad[:, :6]), np.asarray(out_ref), atol=2e-5
    )
    assert bool(jnp.all(out_pad[:, 6:] == 0.0))


@pytest.mark.slow
def test_gradients_finite_and_nonzero():
    cfg = SMALL
    model, params, visual, audio, mask = _init_and_apply(cfg)
    targets = jnp.linspace(0, 1, 10)[None, :].repeat(2, 0)

    def loss(p):
        preds = model.apply({"params": p}, visual, audio, mask)
        return jnp.mean((preds - targets) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_dropout_changes_training_outputs_only():
    cfg = SMALL
    model, params, visual, audio, mask = _init_and_apply(cfg)
    d1 = model.apply({"params": params}, visual, audio, mask, deterministic=True)
    d2 = model.apply({"params": params}, visual, audio, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    t1 = model.apply(
        {"params": params}, visual, audio, mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    t2 = model.apply(
        {"params": params}, visual, audio, mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


@pytest.mark.slow
def test_default_config_parameter_shapes():
    """Flagship dims match the reference contract (av_model.py:7):
    visual 4096, audio 296, hidden 512, fused 1024."""
    cfg = ModelConfig()
    model = make_model(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        jnp.zeros((1, 4, 4096)),
        jnp.zeros((1, 4, 296)),
        jnp.ones((1, 4)),
    )["params"]
    assert params["visual_fc"]["Dense_0"]["kernel"].shape == (4096, 512)
    assert params["audio_fc"]["Dense_0"]["kernel"].shape == (296, 512)
    assert params["scorer_hidden"]["kernel"].shape == (1024, 64)
    assert params["scorer_out"]["kernel"].shape == (64, 1)


@pytest.mark.slow
def test_remat_matches_no_remat():
    """model.remat=true (jax.checkpoint around attention blocks) must be a
    pure memory/compute trade: identical outputs AND gradients."""
    import jax
    import jax.numpy as jnp

    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import ModelConfig

    rng = np.random.default_rng(2)
    visual = rng.standard_normal((2, 10, 48)).astype(np.float32)
    audio = rng.standard_normal((2, 10, 24)).astype(np.float32)
    mask = np.ones((2, 10), np.float32)

    base = dict(visual_dim=48, audio_dim=24, hidden_dim=32, scorer_hidden=8,
                num_heads=2, dropout=0.0)
    m0 = make_model(ModelConfig(**base, remat=False))
    m1 = make_model(ModelConfig(**base, remat=True))
    params = m0.init(jax.random.PRNGKey(0), visual, audio, mask)["params"]

    s0 = np.asarray(m0.apply({"params": params}, visual, audio, mask))
    s1 = np.asarray(m1.apply({"params": params}, visual, audio, mask))
    np.testing.assert_allclose(s0, s1, atol=1e-6)

    def loss(m):
        return lambda p: jnp.mean(
            (m.apply({"params": p}, visual, audio, mask) - 0.5) ** 2
        )

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
