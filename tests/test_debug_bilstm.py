"""Debug utilities + BiLSTM parity vs torch.nn.LSTM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from avsum_tpu.models.temporal import BiLSTM, LSTMCellScan
from avsum_tpu.utils.debug import assert_all_finite, checked, debug_nans


def test_checked_catches_nan():
    f = checked(lambda x: jnp.log(x))
    f(jnp.ones(4))  # fine
    with pytest.raises(Exception, match="nan"):
        f(-jnp.ones(4))


def test_assert_all_finite():
    assert_all_finite({"a": np.ones(3), "b": {"c": np.zeros(2)}})
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite({"a": np.array([1.0, np.nan])})


def test_debug_nans_context_restores():
    prev = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == prev


def _port_lstm_weights(torch_lstm, reverse=False):
    """torch LSTM (i,f,g,o gate order) -> LSTMCellScan params (same order)."""
    sfx = "_reverse" if reverse else ""
    w_ih = getattr(torch_lstm, f"weight_ih_l0{sfx}").detach().numpy()  # [4H, F]
    w_hh = getattr(torch_lstm, f"weight_hh_l0{sfx}").detach().numpy()  # [4H, H]
    b = (
        getattr(torch_lstm, f"bias_ih_l0{sfx}").detach().numpy()
        + getattr(torch_lstm, f"bias_hh_l0{sfx}").detach().numpy()
    )
    return {"wi": w_ih.T, "wh": w_hh.T, "b": b}


def test_lstm_scan_matches_torch_unidirectional():
    torch.manual_seed(0)
    f, h, b_, s = 12, 8, 2, 9
    tl = torch.nn.LSTM(f, h, batch_first=True)
    tl.eval()
    x = np.random.default_rng(0).standard_normal((b_, s, f)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = tl(torch.from_numpy(x))
    params = _port_lstm_weights(tl)
    ours = LSTMCellScan(h).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_bilstm_matches_torch_bidirectional():
    """The parity variant of the reference's nn.LSTM(hidden, hidden//2,
    bidirectional=True) (av_model.py:18-23) must match torch exactly."""
    torch.manual_seed(1)
    f, h, b_, s = 10, 6, 2, 7  # h per direction
    tl = torch.nn.LSTM(f, h, batch_first=True, bidirectional=True)
    tl.eval()
    x = np.random.default_rng(1).standard_normal((b_, s, f)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = tl(torch.from_numpy(x))  # [B, S, 2H]
    params = {
        "fwd": _port_lstm_weights(tl, reverse=False),
        "bwd": _port_lstm_weights(tl, reverse=True),
    }
    ours = BiLSTM(2 * h).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_bilstm_mask_freezes_state():
    """Masked (padded) steps must not alter outputs at real positions."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, 4)).astype(np.float32)
    model = BiLSTM(8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    full = model.apply({"params": params}, jnp.asarray(x))
    x_pad = np.concatenate([x, rng.standard_normal((1, 3, 4)).astype(np.float32)], 1)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.float32)
    padded = model.apply({"params": params}, jnp.asarray(x_pad), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(padded)[:, :5], np.asarray(full), atol=1e-5
    )
