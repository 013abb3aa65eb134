"""Sharded train step on the virtual 8-device CPU mesh (dp×tp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edgedict_tpu import optim
from edgedict_tpu.models import transducer as T
from edgedict_tpu.parallel import (
    make_eval_step, make_mesh, make_train_state, make_train_step,
    shard_batch)

CFG = T.TransducerConfig(
    vocab_size=16, vocab_embed_size=8, input_size=12,
    enc_hidden_size=16, enc_layers=2, enc_proj_size=16,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=16,
    joint_size=16, enc_time_reductions=(1,))


def _batch(rng, b, t=16, u=6):
    return {
        'xs': rng.randn(b, t, CFG.input_size).astype(np.float32),
        'xlen': np.full((b,), t, np.int32),
        'ys': rng.randint(4, CFG.vocab_size, size=(b, u)).astype(np.int32),
        'ylen': np.full((b,), u, np.int32),
    }


def test_train_step_dp_tp_mesh():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {'dp': 4, 'tp': 2, 'pp': 1}
    opt = optim.build_optimizer('adam', lr=1e-3, gradclip=10.0)
    state = make_train_state(jax.random.PRNGKey(0), CFG, opt, mesh)
    step_fn = make_train_step(CFG, opt, mesh, bf16=False)
    rng = np.random.RandomState(0)
    losses = []
    for i in range(4):
        batch = shard_batch(mesh, _batch(rng, 8), accum_steps=2)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i),
                                 jnp.asarray(1e-3))
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert int(state.step) == 4
    # training on the same distribution should reduce loss at least a bit
    assert losses[-1] < losses[0] * 1.5


def test_grad_accum_equivalence():
    """accum=1 and accum=2 over the same global batch give the same params
    (dropout off ⇒ rng-invariant)."""
    mesh = make_mesh(dp=2, tp=1)
    opt = optim.build_optimizer('sgd', lr=1e-2, momentum=0.0)
    rng = np.random.RandomState(1)
    batch = _batch(rng, 8)

    results = []
    for accum in (1, 2):
        state = make_train_state(jax.random.PRNGKey(0), CFG, opt, mesh)
        step_fn = make_train_step(CFG, opt, mesh, bf16=False)
        sb = shard_batch(mesh, batch, accum_steps=accum)
        state, _ = step_fn(state, sb, jax.random.PRNGKey(0),
                           jnp.asarray(1e-2))
        results.append(state.params)
    flat_a = jax.tree.leaves(results[0])
    flat_b = jax.tree.leaves(results[1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_eval_step_sharded():
    mesh = make_mesh(dp=4, tp=2)
    opt = optim.build_optimizer('adam', lr=1e-3)
    state = make_train_state(jax.random.PRNGKey(0), CFG, opt, mesh)
    eval_fn = make_eval_step(CFG, mesh)
    rng = np.random.RandomState(2)
    batch = {k: jax.device_put(v) for k, v in _batch(rng, 8).items()}
    loss, y_seq, out_len = eval_fn(state.params, batch)
    assert np.isfinite(float(loss))
    assert y_seq.shape == (8, 8)   # T=16, time reduction x2


def test_optimizers_smoke():
    """Every optimizer flag value produces finite updates."""
    params = {'w': jnp.ones((4, 3)), 'b': jnp.zeros((3,))}
    grads = {'w': jnp.full((4, 3), 0.1), 'b': jnp.full((3,), -0.2)}
    for name in ('adam', 'adamw', 'sgd', 'sm3', 'novograd'):
        opt = optim.build_optimizer(name, lr=1e-2, gradclip=1.0,
                                    weight_decay=1e-4)
        st = opt.init(params)
        for _ in range(3):
            upd, st = opt.update(grads, st, params)
            params2 = jax.tree.map(lambda p, u: p + u, params, upd)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(params2)), name
        # updates actually move the params
        assert float(jnp.abs(params2['w'] - params['w']).sum()) > 0, name


def test_plateau_scheduler():
    sched = optim.ReduceLROnPlateau(base_lr=1e-3, factor=0.5, patience=1,
                                    min_lr=1e-6)
    assert sched.step(1.0) == 1.0       # improvement (vs inf)
    assert sched.step(1.1) == 1.0       # bad 1 (<= patience)
    assert sched.step(1.2) == 0.5       # bad 2 → decay
    assert sched.step(0.5) == 0.5       # new best, scale kept
    d = sched.state_dict()
    sched2 = optim.ReduceLROnPlateau(1e-3)
    sched2.load_state_dict(d)
    assert sched2.state == sched.state


def test_nonfinite_grad_skips_update():
    """A batch that produces NaN loss must leave params untouched."""
    mesh = make_mesh(dp=2, tp=1)
    opt = optim.build_optimizer('adam', lr=1e-3)
    state = make_train_state(jax.random.PRNGKey(0), CFG, opt, mesh)
    step_fn = make_train_step(CFG, opt, mesh, bf16=False)
    rng = np.random.RandomState(3)
    bad = _batch(rng, 4)
    bad['xs'][0, 0, 0] = np.nan
    before = np.asarray(state.params['joint']['out']['b'])
    state, metrics = step_fn(state, shard_batch(mesh, bad),
                             jax.random.PRNGKey(0), jnp.asarray(1e-3))
    assert float(metrics['skipped']) == 1.0
    np.testing.assert_allclose(
        np.asarray(state.params['joint']['out']['b']), before)
    assert int(state.step) == 1    # step counter still advances

    good = _batch(rng, 4)
    state, metrics = step_fn(state, shard_batch(mesh, good),
                             jax.random.PRNGKey(1), jnp.asarray(1e-3))
    assert float(metrics['skipped']) == 0.0
    assert not np.allclose(
        np.asarray(state.params['joint']['out']['b']), before)


def test_pick_accum_steps_reference_presets():
    from edgedict_tpu.trainer import pick_accum_steps
    # E6D2_LARGE_Batch.txt: batch 128, sub 7 → micro 4 (largest divisor ≤ 7)
    assert pick_accum_steps(128, 7, 1) == 32
    assert pick_accum_steps(128, 7, 4) == 32
    # E4D1.txt: batch 32, sub 16 → exact split
    assert pick_accum_steps(32, 16, 1) == 2
    # E6D2.txt: batch 32, sub 32 → no accumulation
    assert pick_accum_steps(32, 32, 1) == 1
    with pytest.raises(ValueError):
        pick_accum_steps(6, 1, 4)   # nothing fits
