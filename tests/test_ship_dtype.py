"""bf16 weight shipping (vision/backbone.py::ship_dtype_cast): with
uniform bf16 compute, flax's promote_dtype casts f32 params to bf16 at
use, so shipping pre-cast bf16 (half the bytes over the host link) hands
the compute path the same bf16 values. Eagerly that is bit-identical;
under jit, XLA's excess-precision folding may carry the f32 originals
through a cast-at-use conv, so jitted outputs can differ WITHIN bf16
rounding — the declared precision of the path. These tests pin the exact
eager identity, the bounded jit delta, and the structural property
(every param consumer takes the module dtype) the claim rests on."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avsum_tpu.train.config import AudioFeatConfig, VisualFeatConfig
from avsum_tpu.vision.backbone import (
    VisualFrontend,
    fast_init,
    preprocess_frames,
    ship_dtype_cast,
)


class _UniformBackbone(nn.Module):
    """TinyBackbone computes its final Dense in f32 by design (precise
    feature head) — so bf16 shipping is only approximate there. The
    production DualBackbone (ResNet50 + InceptionV3) passes self.dtype to
    EVERY param-consuming layer, making the cast exact; this mini module
    mirrors that uniform-dtype structure for a fast-tier identity test."""

    out_dim: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames, train: bool = False):
        x = preprocess_frames(frames, 32, self.dtype)
        x = nn.relu(nn.Conv(16, (3, 3), strides=(2, 2), dtype=self.dtype)(x))
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


def test_ship_dtype_cast_f32_noop_and_bf16_halves():
    tree = {"w": np.ones((8, 8), np.float32), "i": np.arange(4, dtype=np.int32)}
    out = ship_dtype_cast(tree, jnp.float32)
    assert out["w"].dtype == np.float32
    out = ship_dtype_cast(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == np.int32  # non-float leaves untouched
    # round-to-nearest-even matches XLA's ConvertElementType
    x = np.float32(1.0 + 2**-9)  # exactly halfway between bf16 neighbours
    got = ship_dtype_cast({"x": np.asarray([x])}, jnp.bfloat16)["x"]
    want = jnp.asarray([x]).astype(jnp.bfloat16)
    assert np.array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_visual_bf16_ship_identity():
    """Eagerly, bf16-shipped variables produce bit-identical embeddings to
    f32-shipped variables under uniform bf16 compute; the frontend's jitted
    program stays within bf16 rounding of the f32-shipped one (XLA may fold
    the cast-at-use and keep excess precision there)."""
    model = _UniformBackbone(64)
    variables = fast_init(model, np.zeros((1, 32, 32, 3), np.float32), seed=7)
    frames = np.random.default_rng(0).integers(
        0, 255, (6, 32, 32, 3), dtype=np.uint8
    )

    def embed(v):
        return np.asarray(
            model.apply(jax.device_put(v), frames, train=False),
            dtype=np.float32,
        )

    f32 = embed(variables)
    bf16 = embed(ship_dtype_cast(variables, jnp.bfloat16))
    assert np.array_equal(f32, bf16)  # eager: the cast is RNE-exact

    # the frontend ships bf16 when configured so (ship_cast=True: this
    # custom model is uniform-dtype, so the cast is exact; the auto
    # default only trusts DualBackbone — see the gate test below)
    fe = VisualFrontend(
        VisualFeatConfig(backbone="tiny", dtype="bfloat16"),
        model=model,
        variables=variables,
        batch_size=8,
        ship_cast=True,
    )
    leaves = jax.tree_util.tree_leaves(fe.variables)
    assert all(
        l.dtype == jnp.bfloat16
        for l in leaves
        if jnp.issubdtype(l.dtype, jnp.floating)
    )
    # jitted: bounded by bf16 rounding of the declared-bf16 path
    got = np.asarray(fe._embed(fe.variables, jnp.asarray(frames)), np.float32)
    scale = np.abs(f32).max()
    assert np.abs(got - f32).max() <= 0.02 * scale


def test_ship_cast_gated_off_for_mixed_dtype_backbones():
    """backbone=tiny + dtype=bfloat16 must NOT bf16-round the f32-by-
    design Dense head (advisor r4): make_visual_frontend gates the ship
    cast to uniform-dtype backbones (dual/resnet50)."""
    from avsum_tpu.vision.backbone import make_visual_frontend

    fe = make_visual_frontend(
        VisualFeatConfig(
            backbone="tiny", dtype="bfloat16", feature_dim=64, batch_size=4
        )
    )
    leaves = jax.tree_util.tree_leaves(fe.variables)
    assert any(
        l.dtype == jnp.float32
        for l in leaves
        if jnp.issubdtype(l.dtype, jnp.floating)
    ), "tiny backbone's f32 Dense head was rounded to bf16"


def test_audio_bf16_ship_identity():
    """AudioFrontend(dtype=bfloat16) ships bf16 VGGish params and its shot
    features equal running the same bf16 module on f32-shipped params."""
    from avsum_tpu.audio.frontend import AudioFrontend

    sr = 16000
    wave = np.sin(
        2 * np.pi * 440.0 * np.arange(int(sr * 1.2)) / sr
    ).astype(np.float32)
    bounds = np.array([[0, int(sr * 0.6)], [int(sr * 0.6), int(sr * 1.2)]])

    fe16 = AudioFrontend(AudioFeatConfig(dtype="bfloat16"), seed=5)
    leaves = jax.tree_util.tree_leaves(fe16.vggish_params)
    assert all(
        l.dtype == jnp.bfloat16
        for l in leaves
        if jnp.issubdtype(l.dtype, jnp.floating)
    )

    # same seed, same bf16 module, but params shipped f32: the jitted
    # programs agree within bf16 rounding (see module docstring), and the
    # f32 spectral block (MFCC + log-mel, the torchaudio-pinned contract)
    # is untouched by the VGGish ship dtype — exactly equal
    fe_ref = AudioFrontend(AudioFeatConfig(dtype="bfloat16"), seed=5)
    fe_ref.vggish_params = jax.device_put(
        fast_init(fe_ref.vggish, jnp.zeros((1, 96, 64)), seed=5)["params"]
    )
    a = np.asarray(fe16.shot_features(wave, bounds))
    b = np.asarray(fe_ref.shot_features(wave, bounds))
    n_spectral = 40 + 128  # MFCC ‖ log-mel lead the 296-d contract
    assert np.array_equal(a[:, :n_spectral], b[:, :n_spectral])
    vg_a, vg_b = a[:, n_spectral:], b[:, n_spectral:]
    scale = max(np.abs(vg_b).max(), 1e-6)
    assert np.abs(vg_a - vg_b).max() <= 0.02 * scale


def test_production_backbones_uniform_dtype():
    """Structural guarantee behind the exactness claim: every
    param-consuming layer in ResNet50/InceptionV3/VGGish receives the
    module dtype (no hardcoded-f32 layer that would promote bf16 params
    back up and change numerics)."""
    from avsum_tpu.audio.vggish import VGGish
    from avsum_tpu.vision.inception import InceptionV3
    from avsum_tpu.vision.resnet import ResNet50

    for cls, sample in [
        (ResNet50, np.zeros((1, 64, 64, 3), np.float32)),
        (InceptionV3, np.zeros((1, 96, 96, 3), np.float32)),
        (VGGish, np.zeros((1, 96, 64), np.float32)),
    ]:
        model = cls(dtype=jnp.bfloat16)
        seen = []
        orig = {}
        # capture every Conv/Dense/BatchNorm/LayerNorm call during a
        # shape-only init trace
        for layer in (nn.Conv, nn.Dense, nn.BatchNorm, nn.LayerNorm):
            orig[layer] = layer.__call__

            def wrapped(self, *a, _orig=orig[layer], _seen=seen, **kw):
                _seen.append((type(self).__name__, self.dtype))
                return _orig(self, *a, **kw)

            layer.__call__ = wrapped
        try:
            jax.eval_shape(
                lambda m=model, s=sample: m.init(jax.random.PRNGKey(0), s)
            )
        finally:
            for layer, fn in orig.items():
                layer.__call__ = fn
        assert seen, cls.__name__
        bad = [(n, d) for n, d in seen if d != jnp.bfloat16]
        assert not bad, f"{cls.__name__}: non-bf16 layers {bad[:5]}"
