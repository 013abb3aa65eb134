"""CTC alternate model: loss trains, greedy decode collapses correctly."""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.models.ctc import (
    CTCConfig, ctc_greedy_decode, ctc_init, ctc_loss)

CFG = CTCConfig(vocab_size=10, input_size=8, enc_hidden_size=16,
                enc_layers=2, enc_proj_size=12)


def test_ctc_loss_and_decode():
    params = ctc_init(jax.random.PRNGKey(0), CFG)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 8))
    ys = jnp.asarray([[4, 5, 6], [7, 8, 0]], jnp.int32)
    xlen = jnp.asarray([12, 8])
    ylen = jnp.asarray([3, 2])

    loss, grads = jax.value_and_grad(
        lambda p: ctc_loss(p, CFG, xs, ys, xlen, ylen))(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0

    seqs, neg_logp = ctc_greedy_decode(params, CFG, xs, xlen)
    assert len(seqs) == 2
    for s in seqs:
        assert (np.asarray(s) != CFG.blank).all()


def test_ctc_training_reduces_loss():
    params = ctc_init(jax.random.PRNGKey(2), CFG)
    xs = jax.random.normal(jax.random.PRNGKey(3), (4, 12, 8))
    ys = jnp.tile(jnp.asarray([[4, 5, 6]], jnp.int32), (4, 1))
    xlen = jnp.full((4,), 12)
    ylen = jnp.full((4,), 3)

    import optax
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: ctc_loss(p, CFG, xs, ys, xlen, ylen))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
