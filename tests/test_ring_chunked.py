"""Sequence parallelism: ring attention on the 8-device CPU mesh must match
single-device attention exactly; chunked attention likewise."""

import numpy as np
import pytest

from avsum_tpu.ops.attention import reference_attention
from avsum_tpu.ops.chunked import chunked_attention
from avsum_tpu.parallel import MeshConfig, build_mesh
from avsum_tpu.parallel.ring import ring_attention


def _qkv(b, s, h, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: rng.standard_normal((b, s, h, d)).astype(np.float32)
    return mk(), mk(), mk()


@pytest.fixture(scope="module")
def seq_mesh():
    # all 8 devices on the seq axis: the strongest ring test
    return build_mesh(MeshConfig(data=1, seq=8, model=1, auto_data=False))


def test_ring_attention_matches_reference(seq_mesh):
    q, k, v = _qkv(2, 64, 4, 32, seed=1)
    out = np.asarray(ring_attention(q, k, v, seq_mesh))
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_ring_attention_with_mask(seq_mesh):
    q, k, v = _qkv(1, 64, 2, 32, seed=2)
    mask = np.zeros((1, 64), bool)
    mask[:, :50] = True
    out = np.asarray(ring_attention(q, k, v, seq_mesh, mask=mask))
    ref = np.asarray(reference_attention(q, k, v, mask=mask))
    np.testing.assert_allclose(out[:, :50], ref[:, :50], rtol=2e-4, atol=2e-4)


def test_ring_attention_two_device_axis():
    mesh = build_mesh(MeshConfig(data=4, seq=2, model=1, auto_data=False))
    q, k, v = _qkv(1, 32, 2, 16, seed=3)
    out = np.asarray(ring_attention(q, k, v, mesh))
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("s,chunk", [(200, 64), (512, 128), (64, 256)])
def test_chunked_attention_matches_reference(s, chunk):
    q, k, v = _qkv(2, s, 2, 32, seed=s)
    mask = np.ones((2, s), bool)
    mask[1, s // 2 :] = False
    out = np.asarray(chunked_attention(q, k, v, mask=mask, chunk_size=chunk))
    ref = np.asarray(reference_attention(q, k, v, mask=mask))
    np.testing.assert_allclose(
        out[mask], ref[mask], rtol=2e-4, atol=2e-4
    )


def test_scorer_with_chunked_attention():
    """model.chunk_size routes the scorer's fusion attention through the
    chunked path without changing results."""
    import jax

    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import ModelConfig

    base = ModelConfig(visual_dim=32, audio_dim=16, hidden_dim=32,
                       scorer_hidden=8, temporal_encoder="tcn")
    chunked = ModelConfig(visual_dim=32, audio_dim=16, hidden_dim=32,
                          scorer_hidden=8, temporal_encoder="tcn",
                          chunk_size=16)
    rng = jax.random.PRNGKey(0)
    visual = jax.random.normal(rng, (1, 40, 32))
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (1, 40, 16))
    mask = np.ones((1, 40), np.float32)
    m1, m2 = make_model(base), make_model(chunked)
    params = m1.init(rng, visual, audio, mask)["params"]
    o1 = m1.apply({"params": params}, visual, audio, mask)
    o2 = m2.apply({"params": params}, visual, audio, mask)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-5)
