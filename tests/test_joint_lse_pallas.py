"""Fused joint+LSE Pallas kernel (ops/joint_lse_pallas.py) vs the plain
XLA computation: forward values and ALL gradients (f, g, W, bias), plus
end-to-end equality of rnnt_loss_from_joint on both paths.

Runs in interpret mode on CPU (fp32 exact); the same kernel compiles on
TPU where it is the production path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgedict_tpu.ops.joint_lse_pallas import (
    fused_joint_lse, joint_lse_eligible)


def _xla_reference(f, g, w_t, bias, labels, blank):
    """The un-fused computation the kernel replaces."""
    h = jnp.tanh(f[:, :, None, :] + g[:, None, :, :])     # (B,T,U1,J)
    logits = jnp.einsum('btuj,jv->btuv', h, w_t) + bias
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    blank_lp = logits[..., blank] - lse
    u = labels.shape[1]
    label_lp = jnp.take_along_axis(
        logits[:, :, :u, :], labels[:, None, :, None], axis=-1
    )[..., 0] - lse[:, :, :u]
    return blank_lp, label_lp


def _case(key, B=2, T=5, U=6, J=16, V=32):
    ks = jax.random.split(key, 5)
    f = jax.random.normal(ks[0], (B, T, J)) * 0.5
    g = jax.random.normal(ks[1], (B, U + 1, J)) * 0.5
    w_t = jax.random.normal(ks[2], (J, V)) * 0.3
    bias = jax.random.normal(ks[3], (V,)) * 0.2
    labels = jax.random.randint(ks[4], (B, U), 1, V)
    return f, g, w_t, bias, labels


def test_forward_parity(monkeypatch):
    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', 'force')
    f, g, w_t, bias, labels = _case(jax.random.PRNGKey(0))
    got_b, got_l = fused_joint_lse(f, g, w_t, bias, labels, 0)
    want_b, want_l = _xla_reference(f, g, w_t, bias, labels, 0)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_big_u_and_odd_t(monkeypatch):
    """U+1 > 64 exercises the R_U=128/R_T=1 blocking; odd T the padding."""
    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', 'force')
    f, g, w_t, bias, labels = _case(jax.random.PRNGKey(1), T=3, U=70)
    got_b, got_l = fused_joint_lse(f, g, w_t, bias, labels, 0)
    want_b, want_l = _xla_reference(f, g, w_t, bias, labels, 0)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity(monkeypatch):
    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', 'force')
    f, g, w_t, bias, labels = _case(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    # weighted sum → non-trivial cotangents for BOTH outputs
    wb = jax.random.normal(key, (2, 5, 7))
    wl = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 6))

    def loss(fn):
        def inner(f, g, w_t, bias):
            b, l = fn(f, g, w_t, bias, labels, 0)
            return jnp.sum(b * wb) + jnp.sum(l * wl)
        return inner

    got = jax.grad(loss(fused_joint_lse), argnums=(0, 1, 2, 3))(
        f, g, w_t, bias)
    want = jax.grad(loss(_xla_reference), argnums=(0, 1, 2, 3))(
        f, g, w_t, bias)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_rnnt_loss_from_joint_fused_equals_xla(monkeypatch):
    """End-to-end: the production loss on the fused path == the chunked
    XLA path, values AND gradients through the full joint params."""
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss_from_joint

    B, T, U, E, D, J, V = 2, 9, 4, 12, 10, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    h_enc = jax.random.normal(ks[0], (B, T, E)) * 0.5
    h_dec = jax.random.normal(ks[1], (B, U + 1, D)) * 0.5
    joint_params = {
        'w_enc': jax.random.normal(ks[2], (J, E)) * 0.3,
        'w_dec': jax.random.normal(ks[3], (J, D)) * 0.3,
        'b': jnp.zeros((J,)),
        'out': {'w': jax.random.normal(ks[4], (V, J)) * 0.3,
                'b': jnp.zeros((V,))},
    }
    labels = jax.random.randint(ks[5], (B, U), 1, V)
    xlen = jnp.asarray([T, T - 2], jnp.int32)
    ylen = jnp.asarray([U, U - 1], jnp.int32)

    def run():
        def loss(jp, he, hd):
            return jnp.sum(rnnt_loss_from_joint(
                jp, he, hd, labels, xlen, ylen))
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            joint_params, h_enc, h_dec)
        return val, grads

    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', 'force')
    val_p, grads_p = run()
    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', '0')
    val_x, grads_x = run()

    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_x), jax.tree.leaves(grads_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_train_step_routes_fused_joint_on_dp_mesh(monkeypatch):
    """FULL sharded train step on the 8-device dp mesh with the fused
    joint kernel engaged (force/interpret, via shard_map) == the XLA
    path: same loss, same updated params.  pallas_call can't be GSPMD-
    partitioned, so this pins the shard_map routing in rnnt_loss."""
    import edgedict_tpu.ops.joint_lse_pallas as jl
    from edgedict_tpu import optim
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.parallel import (
        make_mesh, make_train_state, make_train_step, shard_batch)

    cfg = T.TransducerConfig(
        vocab_size=128, vocab_embed_size=8, input_size=16,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=16,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=16,
        joint_size=128, enc_time_reductions=(1,))
    mesh = make_mesh(dp=8, tp=1)
    b, t, u = 16, 6, 4
    rng = np.random.RandomState(0)
    raw = {
        'xs': rng.randn(b, t, cfg.input_size).astype(np.float32),
        'xlen': np.full((b,), t, np.int32),
        'ys': rng.randint(4, cfg.vocab_size, (b, u)).astype(np.int32),
        'ylen': np.full((b,), u, np.int32),
    }

    def one_step(mode):
        monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', mode)
        opt = optim.build_optimizer('adam', lr=1e-3, gradclip=10.0)
        state = make_train_state(jax.random.PRNGKey(0), cfg, opt, mesh)
        step = make_train_step(cfg, opt, mesh, bf16=False)
        batch = shard_batch(mesh, raw, accum_steps=1)
        state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              jnp.asarray(1e-3))
        return state, metrics

    calls = []
    orig = jl.fused_joint_lse

    def spy(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    # the sharded branch now runs fused_joint_lse + the lattice core
    # inside ONE shard_map body (rnnt_loss.rnnt_loss_from_joint); the
    # kernel entry itself is the spy point
    monkeypatch.setattr(jl, 'fused_joint_lse', spy)
    import edgedict_tpu.ops.rnnt_loss  # noqa: F401 (spy is looked up late)
    state_p, m_p = one_step('force')
    assert calls, 'fused joint shard_map path did not engage'
    state_s, m_s = one_step('0')

    np.testing.assert_allclose(float(m_p['loss']), float(m_s['loss']),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(state_s.params),
                     jax.tree.leaves(state_p.params)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_eligibility_gate(monkeypatch):
    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', 'force')
    from edgedict_tpu.ops import joint_lse_pallas as JL
    assert joint_lse_eligible(61, 640, 2048)
    assert not joint_lse_eligible(JL.ROWS + 1, 640, 2048)  # U+1 > ROWS
    assert not joint_lse_eligible(61, 100, 2048)    # J not 128-aligned
    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', '0')
    assert not joint_lse_eligible(61, 640, 2048)


def test_forward_parity_column_blocked(monkeypatch):
    """EDGEDICT_JOINT_FWD_COLS: the flash-style column-blocked forward
    (running max/sum over V blocks, per-block gathers) matches the
    whole-V kernel and the XLA reference; gradients keep flowing through
    the (unchanged) backward."""
    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', 'force')
    monkeypatch.setenv('EDGEDICT_JOINT_FWD_COLS', '128')
    f, g, w_t, bias, labels = _case(jax.random.PRNGKey(2), V=256)
    got_b, got_l = fused_joint_lse(f, g, w_t, bias, labels, 0)
    want_b, want_l = _xla_reference(f, g, w_t, bias, labels, 0)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-5, atol=1e-5)

    def loss(f_, g_, w_, b_):
        bb, ll = fused_joint_lse(f_, g_, w_, b_, labels, 0)
        return jnp.sum(bb) + 2.0 * jnp.sum(ll)

    got = jax.grad(loss, argnums=(0, 1, 2, 3))(f, g, w_t, bias)

    def loss_ref(f_, g_, w_, b_):
        bb, ll = _xla_reference(f_, g_, w_, b_, labels, 0)
        return jnp.sum(bb) + 2.0 * jnp.sum(ll)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(f, g, w_t, bias)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=2e-4, atol=2e-4)

    # ineligible block sizes fall back to the whole-V kernel
    from edgedict_tpu.ops.joint_lse_pallas import _fwd_col_block
    monkeypatch.setenv('EDGEDICT_JOINT_FWD_COLS', '100')
    assert _fwd_col_block(256) == 0
    monkeypatch.setenv('EDGEDICT_JOINT_FWD_COLS', '256')
    assert _fwd_col_block(256) == 0          # cb == V: use whole-V path


def test_u_envelope_disengage_warns_once(monkeypatch):
    """ONLY the U-envelope disengage warns (once): at production-aligned
    shapes the fused->chunked swap is a measured ~17x step regression
    (VALIDATION.md 5c), silent at runtime — the trace-time warning is
    the operator's one signal.  Misaligned toy shapes must stay quiet."""
    import warnings
    from edgedict_tpu.ops import joint_lse_pallas as jl

    monkeypatch.setenv('EDGEDICT_PALLAS_JOINT', 'force')
    monkeypatch.setattr(jl, '_warned_envelope', False)

    rows = jl.ROWS
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        # aligned joint/vocab, U+1 past the envelope -> warn
        assert not jl.joint_lse_eligible(rows + 1, 128, 256)
        # second disengage: one-time only
        assert not jl.joint_lse_eligible(rows + 2, 128, 256)
        # misaligned vocab (toy config): no warning even past the envelope
        monkeypatch.setattr(jl, '_warned_envelope', False)
        assert not jl.joint_lse_eligible(rows + 1, 128, 100)
        # inside the envelope: eligible, no warning
        assert jl.joint_lse_eligible(rows - 1, 128, 256)
    msgs = [str(w.message) for w in rec
            if 'disengaged' in str(w.message)]
    assert len(msgs) == 1 and 'EDGEDICT_JOINT_ROWS' in msgs[0]
