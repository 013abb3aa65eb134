"""Pallas RNN-T loss kernels vs the associative-scan production loss
(runs in interpret mode on CPU; the same kernels compile on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.ops.rnnt_loss import rnnt_loss
from edgedict_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas


def _case(rng, b, t, u, v):
    logits = jnp.asarray(rng.randn(b, t, u + 1, v), jnp.float32)
    labels = jnp.asarray(rng.randint(1, v, (b, u)), jnp.int32)
    xlen = jnp.asarray(rng.randint(max(1, t - 3), t + 1, (b,)), jnp.int32)
    ylen = jnp.asarray(rng.randint(max(1, u - 2), u + 1, (b,)), jnp.int32)
    return logits, labels, xlen, ylen


def test_pallas_loss_parity():
    rng = np.random.RandomState(0)
    logits, labels, xlen, ylen = _case(rng, 3, 7, 5, 9)
    want = np.asarray(rnnt_loss(logits, labels, xlen, ylen))
    got = np.asarray(rnnt_loss_pallas(logits, labels, xlen, ylen))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_grad_parity():
    rng = np.random.RandomState(1)
    logits, labels, xlen, ylen = _case(rng, 2, 5, 4, 7)

    g_want = jax.grad(lambda lg: jnp.sum(
        rnnt_loss(lg, labels, xlen, ylen)))(logits)
    g_got = jax.grad(lambda lg: jnp.sum(
        rnnt_loss_pallas(lg, labels, xlen, ylen)))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-3, atol=1e-4)


def test_pallas_weighted_cotangent():
    """Non-uniform cotangents flow through the fused backward correctly."""
    rng = np.random.RandomState(2)
    logits, labels, xlen, ylen = _case(rng, 2, 4, 3, 6)
    w = jnp.asarray([0.3, 1.7])

    g_want = jax.grad(lambda lg: jnp.sum(
        w * rnnt_loss(lg, labels, xlen, ylen)))(logits)
    g_got = jax.grad(lambda lg: jnp.sum(
        w * rnnt_loss_pallas(lg, labels, xlen, ylen)))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-3, atol=1e-4)


def test_pallas_batch_padding():
    """Batch sizes not divisible by the 8-row tile pad correctly."""
    rng = np.random.RandomState(3)
    logits, labels, xlen, ylen = _case(rng, 5, 6, 4, 8)
    want = np.asarray(rnnt_loss(logits, labels, xlen, ylen))
    got = np.asarray(rnnt_loss_pallas(logits, labels, xlen, ylen))
    assert got.shape == (5,)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_default_core_switch(monkeypatch):
    """rnnt_loss_from_joint (the training path) with
    EDGEDICT_PALLAS_RNNT=force (the TPU production core, interpret mode
    here) == the scan core: loss and grads w.r.t. joint params and both
    activations.  Guards the default_core() switch that makes the Pallas
    kernel the production path on TPU."""
    from edgedict_tpu.models.transducer import TransducerConfig, joint_init
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss_from_joint

    cfg = TransducerConfig(
        vocab_size=16, vocab_embed_size=8, input_size=8,
        enc_hidden_size=16, enc_layers=1, enc_proj_size=8,
        dec_hidden_size=8, dec_layers=1, dec_proj_size=8,
        joint_size=8, enc_time_reductions=())
    jp = joint_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(4)
    h_enc = jnp.asarray(rng.randn(2, 6, cfg.enc_proj_size), jnp.float32)
    h_dec = jnp.asarray(rng.randn(2, 5, cfg.dec_proj_size), jnp.float32)
    ys = jnp.asarray(rng.randint(4, cfg.vocab_size, (2, 4)), jnp.int32)
    xlen = jnp.asarray([6, 4], jnp.int32)
    ylen = jnp.asarray([4, 2], jnp.int32)

    def loss_and_grad():
        f = lambda p, he, hd: jnp.mean(rnnt_loss_from_joint(
            p, he, hd, ys, xlen, ylen, time_chunk=4))
        return jax.value_and_grad(f, argnums=(0, 1, 2))(jp, h_enc, h_dec)

    monkeypatch.setenv('EDGEDICT_PALLAS_RNNT', '0')
    l_s, g_s = loss_and_grad()
    monkeypatch.setenv('EDGEDICT_PALLAS_RNNT', 'force')
    l_p, g_p = loss_and_grad()

    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
