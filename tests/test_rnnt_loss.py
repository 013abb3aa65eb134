"""RNN-T loss parity ladder (SURVEY.md §7 step 3).

Oracles:
  * brute-force path enumeration on tiny lattices
  * the nested-DP reference implementation + jax.grad
Production paths under test:
  * rnnt_loss (associative-scan α/β + custom_vjp analytic gradient)
  * rnnt_loss_from_joint (fused joint, chunked remat)
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgedict_tpu.ops.rnnt_loss import (
    rnnt_loss, rnnt_loss_from_joint, rnnt_loss_reference)


def brute_force_nll(log_probs, labels, t_len, u_len, blank):
    """Enumerate all monotone paths through the (t, u) lattice."""
    lp = np.asarray(log_probs, dtype=np.float64)
    paths = []

    def walk(t, u, acc):
        if t == t_len:
            return
        if t == t_len - 1 and u == u_len:
            paths.append(acc + lp[t, u, blank])
            return
        # blank: consume frame
        if t < t_len - 1 or u == u_len:
            walk(t + 1, u, acc + lp[t, u, blank])
        # label
        if u < u_len:
            walk(t, u + 1, acc + lp[t, u, labels[u]])

    walk(0, 0, 0.0)
    m = max(paths)
    return -(m + np.log(sum(np.exp(p - m) for p in paths)))


def _random_case(key, B, T, U, V):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    logits = jax.random.normal(k1, (B, T, U + 1, V)) * 2.0
    labels = jax.random.randint(k2, (B, U), 1, V)
    xlen = jax.random.randint(k3, (B,), max(1, T - 2), T + 1)
    ylen = jax.random.randint(k4, (B,), max(1, U - 2), U + 1)
    return logits, labels, xlen, ylen


def test_loss_matches_brute_force():
    key = jax.random.PRNGKey(0)
    B, T, U, V = 2, 4, 2, 5
    logits, labels, xlen, ylen = _random_case(key, B, T, U, V)
    lp = jax.nn.log_softmax(logits, axis=-1)
    loss = rnnt_loss(logits, labels, xlen, ylen, blank=0)
    for b in range(B):
        expected = brute_force_nll(lp[b], np.asarray(labels[b]),
                                   int(xlen[b]), int(ylen[b]), 0)
        np.testing.assert_allclose(float(loss[b]), expected, rtol=1e-5)


def test_production_matches_reference_dp():
    key = jax.random.PRNGKey(1)
    B, T, U, V = 3, 9, 5, 11
    logits, labels, xlen, ylen = _random_case(key, B, T, U, V)
    l_prod = rnnt_loss(logits, labels, xlen, ylen, blank=0)
    l_ref = rnnt_loss_reference(logits, labels, xlen, ylen, blank=0)
    np.testing.assert_allclose(np.asarray(l_prod), np.asarray(l_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_autodiff_oracle():
    key = jax.random.PRNGKey(2)
    B, T, U, V = 2, 7, 4, 9
    logits, labels, xlen, ylen = _random_case(key, B, T, U, V)

    g_prod = jax.grad(lambda lg: jnp.sum(rnnt_loss(
        lg, labels, xlen, ylen, blank=0)))(logits)
    g_ref = jax.grad(lambda lg: jnp.sum(rnnt_loss_reference(
        lg, labels, xlen, ylen, blank=0)))(logits)
    np.testing.assert_allclose(np.asarray(g_prod), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_padding_invariance():
    """Extra T/U padding must not change loss or in-range gradients."""
    key = jax.random.PRNGKey(3)
    B, T, U, V = 2, 6, 3, 7
    logits, labels, xlen, ylen = _random_case(key, B, T, U, V)
    loss = rnnt_loss(logits, labels, xlen, ylen, blank=0)

    pad_logits = jnp.pad(logits, ((0, 0), (0, 4), (0, 2), (0, 0)),
                         constant_values=0.3)
    pad_labels = jnp.pad(labels, ((0, 0), (0, 2)), constant_values=5)
    loss_p = rnnt_loss(pad_logits, pad_labels, xlen, ylen, blank=0)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss_p),
                               rtol=1e-5)
    g = jax.grad(lambda lg: jnp.sum(rnnt_loss(
        lg, pad_labels, xlen, ylen, blank=0)))(pad_logits)
    # gradients in padded region are exactly zero
    assert float(jnp.abs(g[:, T:]).max()) == 0.0
    assert float(jnp.abs(g[:, :, U + 1:]).max()) == 0.0


def test_fused_joint_matches_full_lattice():
    from edgedict_tpu.models.transducer import (
        TransducerConfig, joint_apply, joint_init)
    key = jax.random.PRNGKey(4)
    B, T, U, E, D, J, V = 2, 37, 6, 16, 12, 20, 30
    cfg = TransducerConfig(vocab_size=V, enc_proj_size=E, dec_proj_size=D,
                           joint_size=J)
    jp = joint_init(key, cfg)
    h_enc = jax.random.normal(jax.random.PRNGKey(5), (B, T, E))
    h_dec = jax.random.normal(jax.random.PRNGKey(6), (B, U + 1, D))
    labels = jax.random.randint(jax.random.PRNGKey(7), (B, U), 1, V)
    xlen = jnp.array([T, T - 5])
    ylen = jnp.array([U, U - 2])

    logits = joint_apply(jp, h_enc, h_dec)
    l_full = rnnt_loss(logits, labels, xlen, ylen, blank=0)
    l_fused = rnnt_loss_from_joint(jp, h_enc, h_dec, labels, xlen, ylen,
                                   blank=0, time_chunk=8)
    np.testing.assert_allclose(np.asarray(l_full), np.asarray(l_fused),
                               rtol=1e-5, atol=1e-5)

    # gradients w.r.t. joint params and activations agree
    def f_full(p, he, hd):
        return jnp.sum(rnnt_loss(joint_apply(p, he, hd), labels, xlen, ylen))

    def f_fused(p, he, hd):
        return jnp.sum(rnnt_loss_from_joint(p, he, hd, labels, xlen, ylen,
                                            time_chunk=8))

    gf = jax.grad(f_full, argnums=(0, 1, 2))(jp, h_enc, h_dec)
    gz = jax.grad(f_fused, argnums=(0, 1, 2))(jp, h_enc, h_dec)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gz)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


def test_loss_is_jittable_and_stable():
    key = jax.random.PRNGKey(8)
    B, T, U, V = 4, 50, 20, 64
    logits, labels, xlen, ylen = _random_case(key, B, T, U, V)
    f = jax.jit(lambda lg: rnnt_loss(lg, labels, xlen, ylen, blank=0))
    loss = f(logits)
    assert np.all(np.isfinite(np.asarray(loss)))
    g = jax.jit(jax.grad(lambda lg: jnp.sum(rnnt_loss(
        lg, labels, xlen, ylen, blank=0))))(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_edge_cases_empty_labels_and_min_lattice():
    """ylen=0 (pure blank path) and T=1 minimal lattices."""
    key = jax.random.PRNGKey(11)
    B, T, U, V = 2, 4, 3, 8
    logits = jax.random.normal(key, (B, T, U + 1, V))
    labels = jnp.zeros((B, U), jnp.int32)
    xlen = jnp.asarray([4, 2])
    ylen = jnp.asarray([0, 0])
    loss = rnnt_loss(logits, labels, xlen, ylen)
    # pure blank path: loss = -sum_t log P(blank | t, u=0)
    lp = jax.nn.log_softmax(logits, axis=-1)
    for b, L in enumerate([4, 2]):
        want = -float(jnp.sum(lp[b, :L, 0, 0]))
        np.testing.assert_allclose(float(loss[b]), want, rtol=1e-5)

    # T == 1, U == 1: exactly one alignment (label then blank is impossible
    # in 1 frame... blank only if ylen=0; label+blank needs t<1 for label
    # and consumes the frame with blank)
    logits1 = jax.random.normal(key, (1, 1, 2, V))
    l1 = rnnt_loss(logits1, jnp.asarray([[3]]), jnp.asarray([1]),
                   jnp.asarray([1]))
    lp1 = jax.nn.log_softmax(logits1, axis=-1)
    want1 = -float(lp1[0, 0, 0, 3] + lp1[0, 0, 1, 0])
    np.testing.assert_allclose(float(l1[0]), want1, rtol=1e-5)
