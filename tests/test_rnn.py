"""LSTM/GRU parity against PyTorch primitives.

The reference relies on cuDNN nn.LSTM/nn.GRU semantics (gate order i,f,g,o /
r,z,n; separate b_ih/b_hh); checkpoint-import parity requires our scan cells
to match torch bit-for-bit (up to fp32 roundoff).  SURVEY.md §7 hard part #4.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from edgedict_tpu.ops import rnn as rnn_ops

torch = pytest.importorskip('torch')


def _copy_torch_lstm(torch_lstm, layer=0):
    sfx = f'_l{layer}'
    return {
        'w_ih': jnp.asarray(getattr(torch_lstm, 'weight_ih' + sfx).detach().numpy()),
        'w_hh': jnp.asarray(getattr(torch_lstm, 'weight_hh' + sfx).detach().numpy()),
        'b_ih': jnp.asarray(getattr(torch_lstm, 'bias_ih' + sfx).detach().numpy()),
        'b_hh': jnp.asarray(getattr(torch_lstm, 'bias_hh' + sfx).detach().numpy()),
    }


def test_lstm_layer_matches_torch():
    torch.manual_seed(0)
    B, T, I, H = 3, 17, 12, 24
    tl = torch.nn.LSTM(I, H, 1, batch_first=True)
    x = torch.randn(B, T, I)
    h0 = torch.randn(1, B, H)
    c0 = torch.randn(1, B, H)
    with torch.no_grad():
        y_t, (h_t, c_t) = tl(x, (h0, c0))

    params = _copy_torch_lstm(tl)
    y, (h, c) = rnn_ops.lstm_layer(
        params, jnp.asarray(x.numpy()),
        (jnp.asarray(h0[0].numpy()), jnp.asarray(c0[0].numpy())))
    np.testing.assert_allclose(np.asarray(y), y_t.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t[0].numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_t[0].numpy(), rtol=1e-5,
                               atol=1e-5)


def test_gru_layer_matches_torch():
    torch.manual_seed(1)
    B, T, I, H = 2, 11, 8, 16
    tg = torch.nn.GRU(I, H, 1, batch_first=True)
    x = torch.randn(B, T, I)
    h0 = torch.randn(1, B, H)
    with torch.no_grad():
        y_t, h_t = tg(x, h0)
    params = _copy_torch_lstm(tg)
    y, h = rnn_ops.gru_layer(params, jnp.asarray(x.numpy()),
                             jnp.asarray(h0[0].numpy()))
    np.testing.assert_allclose(np.asarray(y), y_t.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t[0].numpy(), rtol=1e-5,
                               atol=1e-5)


def test_stacked_lstm_matches_torch():
    torch.manual_seed(2)
    B, T, I, H, L = 2, 9, 6, 10, 3
    tl = torch.nn.LSTM(I, H, L, batch_first=True)
    x = torch.randn(B, T, I)
    h0 = torch.randn(L, B, H)
    c0 = torch.randn(L, B, H)
    with torch.no_grad():
        y_t, (h_t, c_t) = tl(x, (h0, c0))
    params = {'layers': [_copy_torch_lstm(tl, i) for i in range(L)]}
    y, (h, c) = rnn_ops.stacked_lstm(
        params, jnp.asarray(x.numpy()),
        (jnp.asarray(h0.numpy()), jnp.asarray(c0.numpy())))
    np.testing.assert_allclose(np.asarray(y), y_t.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_t.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_lstm_chunked_equals_full():
    """State-carrying chunked scan == one full scan (the streaming
    invariant, SURVEY.md §4 implication c)."""
    import jax
    key = jax.random.PRNGKey(0)
    B, T, I, H = 2, 24, 8, 16
    params = rnn_ops.lstm_init(key, I, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, I))
    state = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    y_full, _ = rnn_ops.lstm_layer(params, xs, state)
    chunks = []
    st = state
    for i in range(0, T, 6):
        y, st = rnn_ops.lstm_layer(params, xs[:, i:i + 6], st)
        chunks.append(y)
    y_chunked = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_chunked),
                               rtol=1e-5, atol=1e-5)
