"""Pallas LSTM recurrence vs the scan layer: forward and full VJP parity
(interpret mode on CPU; same kernels compile on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.ops import rnn as rnn_ops
from edgedict_tpu.ops.rnn_pallas import lstm_layer_pallas


def _setup(b=4, t=12, i=16, h=8, seed=0):
    params = rnn_ops.lstm_init(jax.random.PRNGKey(seed), i, h)
    xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, i))
    h0 = jax.random.normal(jax.random.PRNGKey(seed + 2), (b, h)) * 0.1
    c0 = jax.random.normal(jax.random.PRNGKey(seed + 3), (b, h)) * 0.1
    return params, xs, (h0, c0)


def test_forward_parity():
    params, xs, state = _setup()
    ys_s, (h_s, c_s) = rnn_ops.lstm_layer(params, xs, state)
    ys_p, (h_p, c_p) = lstm_layer_pallas(params, xs, state)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s),
                               rtol=1e-5, atol=1e-5)


def test_vjp_parity_all_inputs():
    params, xs, state = _setup(seed=5)

    def loss(layer):
        def f(params, xs, state):
            ys, (h, c) = layer(params, xs, state)
            # exercise dys, dhT and dcT cotangents with different weights
            return (jnp.sum(ys * jnp.cos(jnp.arange(ys.shape[1])
                                         )[None, :, None])
                    + 2.0 * jnp.sum(h) + 3.0 * jnp.sum(c * c))
        return f

    g_s = jax.grad(loss(rnn_ops.lstm_layer), argnums=(0, 1, 2))(
        params, xs, state)
    g_p = jax.grad(loss(lstm_layer_pallas), argnums=(0, 1, 2))(
        params, xs, state)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_state_carry_chunks():
    """Chunked calls with carried state == one full call (streaming)."""
    params, xs, state = _setup(t=10, seed=9)
    full, (h_f, c_f) = lstm_layer_pallas(params, xs, state)
    outs = []
    st = state
    for k in range(0, 10, 5):
        y, st = lstm_layer_pallas(params, xs[:, k:k + 5], st)
        outs.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(full), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(h_f),
                               rtol=1e-5, atol=1e-5)


def test_gru_forward_parity():
    from edgedict_tpu.ops.rnn_pallas import gru_layer_pallas
    params = rnn_ops.gru_init(jax.random.PRNGKey(2), 16, 8)
    xs = jax.random.normal(jax.random.PRNGKey(3), (4, 10, 16))
    h0 = jax.random.normal(jax.random.PRNGKey(4), (4, 8)) * 0.1
    ys_s, h_s = rnn_ops.gru_layer(params, xs, h0)
    ys_p, h_p = gru_layer_pallas(params, xs, h0)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_s),
                               rtol=1e-5, atol=1e-5)


def test_shard_mapped_recurrence_matches_scan():
    """The Pallas recurrence under shard_map on the 8-device mesh (batch
    sharded over 'dp', weights replicated) == the scan layer — the wiring
    needed to route the kernel through dp training meshes."""
    from edgedict_tpu.ops.rnn_pallas import lstm_recurrence_pallas_sharded
    from edgedict_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, tp=1)
    b, t, i, h = 8, 6, 16, 8
    params = rnn_ops.lstm_init(jax.random.PRNGKey(7), i, h)
    xs = jax.random.normal(jax.random.PRNGKey(8), (b, t, i))
    h0 = jnp.zeros((b, h))
    c0 = jnp.zeros((b, h))

    bias = params['b_ih'] + params['b_hh']
    x_proj = jnp.einsum('bti,gi->btg', xs, params['w_ih']) + bias
    w_hh_t = jnp.swapaxes(params['w_hh'], 0, 1)
    ys, hT, cT = lstm_recurrence_pallas_sharded(
        mesh, x_proj, w_hh_t, h0, c0)

    ys_ref, (h_ref, c_ref) = rnn_ops.lstm_layer(params, xs, (h0, c0))
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
