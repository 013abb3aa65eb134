"""Numerical oracles for the from-scratch optimizers (SM3 / Novograd):
hand-computed update rules on tiny tensors."""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.optim import scale_by_novograd, scale_by_sm3


def test_sm3_rank2_accumulators():
    """SM3-II on a rank-2 param: nu = min(row_acc, col_acc) + g²;
    update = g/√nu; accumulators keep per-dim maxima."""
    opt = scale_by_sm3(momentum=0.0, beta=0.0, eps=0.0)
    params = {'w': jnp.zeros((2, 3))}
    g1 = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    state = opt.init(params)
    upd, state = opt.update({'w': g1}, state, params)

    nu1 = np.asarray(g1) ** 2                # first step: min(0,0)+g² = g²
    np.testing.assert_allclose(np.asarray(upd['w']), np.asarray(g1)
                               / np.sqrt(nu1), rtol=1e-6)
    row_acc, col_acc = state['accs']['w']
    np.testing.assert_allclose(np.asarray(row_acc)[:, 0],
                               nu1.max(axis=1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(col_acc)[0, :],
                               nu1.max(axis=0), rtol=1e-6)

    # second step with g2: nu2 = min(row_acc, col_acc) + g2²
    g2 = jnp.ones((2, 3))
    upd2, state = opt.update({'w': g2}, state, params)
    nu2 = np.minimum(nu1.max(axis=1, keepdims=True),
                     nu1.max(axis=0, keepdims=True)) + 1.0
    np.testing.assert_allclose(np.asarray(upd2['w']), 1.0 / np.sqrt(nu2),
                               rtol=1e-6)


def test_novograd_layerwise_second_moment():
    """Novograd: v ← ‖g‖² on first step, m ← g/(√v+eps); second step
    v ← b2·v + (1−b2)·‖g‖², m ← b1·m + g/(√v+eps)."""
    b1, b2, eps = 0.9, 0.5, 0.0
    opt = scale_by_novograd(b1=b1, b2=b2, eps=eps)
    params = {'w': jnp.zeros((2,))}
    g1 = jnp.asarray([3.0, 4.0])             # ‖g‖² = 25
    state = opt.init(params)
    upd1, state = opt.update({'w': g1}, state, params)
    m1 = np.asarray(g1) / 5.0
    np.testing.assert_allclose(np.asarray(upd1['w']), m1, rtol=1e-6)

    g2 = jnp.asarray([0.0, 5.0])             # ‖g‖² = 25 → v2 = 25
    upd2, state = opt.update({'w': g2}, state, params)
    m2 = b1 * m1 + np.asarray(g2) / 5.0
    np.testing.assert_allclose(np.asarray(upd2['w']), m2, rtol=1e-6)


def test_sm3_memory_footprint():
    """SM3's whole point: accumulators are rank-1 per dimension, not full."""
    opt = scale_by_sm3()
    params = {'w': jnp.zeros((64, 128))}
    state = opt.init(params)
    sizes = [int(np.prod(a.shape)) for a in state['accs']['w']]
    assert sizes == [64, 128]                # vs 64*128 for adam
