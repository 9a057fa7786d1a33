"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from avsum_tpu.ops.attention import flash_attention, reference_attention


def _rand_qkv(b, s, h, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: rng.standard_normal((b, s, h, d)).astype(np.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("s", [128, 256, 384])
def test_flash_matches_reference(s):
    q, k, v = _rand_qkv(2, s, 4, 64, seed=s)
    ours = np.asarray(flash_attention(q, k, v, interpret=True))
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_flash_with_padding_mask():
    b, s, h, d = 1, 256, 2, 64
    q, k, v = _rand_qkv(b, s, h, d, seed=7)
    mask = np.zeros((b, s), bool)
    mask[:, :100] = True
    ours = np.asarray(flash_attention(q, k, v, mask=mask, interpret=True))
    ref = np.asarray(reference_attention(q, k, v, mask=mask))
    np.testing.assert_allclose(ours[:, :100], ref[:, :100], rtol=2e-4, atol=2e-4)


def test_flash_unaligned_seq_len():
    """S not a multiple of the block size: padded keys must not leak."""
    b, s, h, d = 1, 200, 2, 64
    q, k, v = _rand_qkv(b, s, h, d, seed=9)
    ours = np.asarray(flash_attention(q, k, v, interpret=True))
    ref = np.asarray(reference_attention(q, k, v))
    assert ours.shape == (b, s, h, d)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_flash_multiblock_kv_accumulation():
    """S spanning several kv blocks exercises the online-softmax carry."""
    b, s, h, d = 1, 512, 1, 128
    q, k, v = _rand_qkv(b, s, h, d, seed=11)
    ours = np.asarray(
        flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    )
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_mhsa_pallas_path_matches_xla():
    """models.MultiHeadSelfAttention(use_pallas=True) == XLA path."""
    import flax.linen as nn
    import jax.numpy as jnp

    from avsum_tpu.models.attention import MultiHeadSelfAttention

    b, s, e = 2, 128, 64
    x = np.random.default_rng(3).standard_normal((b, s, e)).astype(np.float32)
    mask = np.ones((b, s), np.float32)
    mask[:, 100:] = 0.0

    mod_x = MultiHeadSelfAttention(e, 4, use_pallas=False)
    params = mod_x.init(jax.random.PRNGKey(0), x, mask)["params"]
    out_xla = mod_x.apply({"params": params}, x, mask)

    # interpret-mode pallas on CPU via the same params
    import avsum_tpu.ops.attention as fa

    orig = fa.flash_attention
    try:
        fa_interp = lambda q, k, v, mask=None, **kw: orig(
            q, k, v, mask=mask, interpret=True
        )
        fa.flash_attention = fa_interp
        mod_p = MultiHeadSelfAttention(e, 4, use_pallas=True)
        out_pal = mod_p.apply({"params": params}, x, mask)
    finally:
        fa.flash_attention = orig
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )
