"""RNN-Transducer lattice loss — TPU-native replacement for warp-transducer.

The reference consumes the C++/CUDA warp-transducer submodule as
`warprnnt_pytorch.RNNTLoss(blank=...)` on full-lattice logits (B, T, U+1, V)
(reference rnnt/models.py:8-11,221,234-239).  This module provides the same
loss three ways (the parity ladder of SURVEY.md §7 step 3):

  1. `rnnt_loss_reference` — plain nested-scan log-space DP, differentiable by
     jax.grad.  Slow; the numerical oracle for tests.
  2. `rnnt_loss` — production lax implementation: the forward/backward (α/β)
     lattice recursions are computed column-by-column over U, with the
     within-column first-order recurrence over T solved by a log-semiring
     `associative_scan` (O(U) sequential steps of O(log T) depth — the TPU
     wavefront).  Analytic gradient fused via `jax.custom_vjp`, exactly like
     warp-transducer's fused CUDA backward.
  3. `rnnt_loss_from_joint` — the memory shape that warp-transducer could not
     offer: takes encoder/decoder activations and joint params, computes
     blank/label log-probs in rematerialized T-chunks so the (B, T, U+1, V)
     logits tensor NEVER exists in HBM (SURVEY.md §7 "hard parts" #3).

Semiring convention: the lattice lives on states (t, u) for t ∈ [0, T],
u ∈ [0, U].  blank transition (t,u)→(t+1,u) with log-prob blank_lp[t,u]
(valid t < xlen), label transition (t,u)→(t,u+1) with label_lp[t,u] =
log P(labels[u] | t, u) (valid t < xlen, u < ylen).  The path ends at
(xlen, ylen); loss = −logZ.
"""


import os

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30  # effectively log(0), finite to avoid inf−inf NaNs


def default_core():
    """The production lattice core.  On TPU this is the fused Pallas
    kernel pair (rnnt_loss_pallas.rnnt_loss_core_pallas) — measured FASTER
    than the associative scan at E6D2 scale on one chip (core fwd+bwd
    1.53 ms vs 2.28 ms; full from-joint path 19.5 ms vs 20.4 ms, B=8
    T=192 U=60 V=2048).  Off-TPU the scan core is the default (interpret-
    mode Pallas is slow); EDGEDICT_PALLAS_RNNT=force overrides for tests,
    =0 disables the kernel everywhere."""
    mode = os.environ.get('EDGEDICT_PALLAS_RNNT', '1')
    if mode != '0' and (mode == 'force'
                        or jax.default_backend() == 'tpu'):
        from edgedict_tpu.ops.rnnt_loss_pallas import rnnt_loss_core_pallas
        return rnnt_loss_core_pallas
    return rnnt_loss_core


# ---------------------------------------------------------------------------
# log-semiring linear recurrence:  a[t] = b[t] ⊕ (c_shift[t] ⊗ a[t-1])
# where ⊕ = logaddexp, ⊗ = +.  Solved in O(log T) depth by composing the
# affine maps f_t(x) = c_shift[t] + x ⊕ b[t] with an associative scan.
# ---------------------------------------------------------------------------

def _compose(e1, e2):
    """Compose affine maps in the log semiring: e2 after e1 (e1 earlier)."""
    c1, b1 = e1
    c2, b2 = e2
    return c1 + c2, jnp.logaddexp(b2, c2 + b1)


def log_linear_scan(c_shift, b, axis):
    """Solve a[t] = logaddexp(b[t], c_shift[t] + a[t-1]) with a[-1] = -inf.

    c_shift[0] must be NEG (no predecessor)."""
    _, a = lax.associative_scan(_compose, (c_shift, b), axis=axis)
    return a


def log_linear_scan_rev(c, b, axis):
    """Solve a[t] = logaddexp(b[t], c[t] + a[t+1]) with a[n] = -inf
    (reverse recurrence), by flipping onto the forward solver.

    With â[s] = a[n-1-s]: â[s] = b̂[s] ⊕ ĉ[s] + â[s-1], so the flipped
    coefficient array IS the forward solver's c_shift (the caller must pass
    c[n-1] = NEG — there is no successor of the last element)."""
    b_f = jnp.flip(b, axis=axis)
    c_f = jnp.flip(c, axis=axis)
    a_f = log_linear_scan(c_f, b_f, axis)
    return jnp.flip(a_f, axis=axis)


# ---------------------------------------------------------------------------
# masked transition tensors
# ---------------------------------------------------------------------------

def _masked_transitions(blank_lp, label_lp, xlen, ylen):
    """Apply validity masks.  blank_lp (B,T,U+1), label_lp (B,T,U)."""
    B, T, U1 = blank_lp.shape
    t_ids = jnp.arange(T)[None, :, None]
    u_ids = jnp.arange(U1)[None, None, :]
    xl = xlen[:, None, None]
    yl = ylen[:, None, None]
    blank_m = jnp.where((t_ids < xl) & (u_ids <= yl),
                        blank_lp.astype(jnp.float32), NEG)
    u_ids_l = jnp.arange(U1 - 1)[None, None, :]
    label_m = jnp.where((t_ids < xl) & (u_ids_l < yl),
                        label_lp.astype(jnp.float32), NEG)
    return blank_m, label_m


def _alpha(blank_m, label_m):
    """Forward lattice: returns alpha (B, T+1, U+1)."""
    B, T, U1 = blank_m.shape
    U = U1 - 1
    # column u=0: pure blank chain
    c0 = jnp.concatenate([jnp.full((B, 1), NEG), blank_m[:, :, 0]], axis=1)
    b0 = jnp.full((B, T + 1), NEG).at[:, 0].set(0.0)
    a0 = log_linear_scan(c0, b0, axis=1)

    blank_cols = jnp.moveaxis(blank_m[:, :, 1:], 2, 0)   # (U, B, T)
    label_cols = jnp.moveaxis(label_m, 2, 0)             # (U, B, T)

    def col_step(a_prev, cols):
        blank_c, label_c = cols
        b = jnp.concatenate(
            [a_prev[:, :T] + label_c, jnp.full((B, 1), NEG)], axis=1)
        c_shift = jnp.concatenate([jnp.full((B, 1), NEG), blank_c], axis=1)
        a = log_linear_scan(c_shift, b, axis=1)
        return a, a

    _, a_rest = lax.scan(col_step, a0, (blank_cols, label_cols))
    alpha = jnp.concatenate([a0[:, None], jnp.moveaxis(a_rest, 0, 1)], axis=1)
    return jnp.moveaxis(alpha, 1, 2)  # (B, T+1, U+1)


def _beta(blank_m, label_m, xlen, ylen):
    """Backward lattice: returns beta (B, T+1, U+1) with beta[xlen,ylen]=0."""
    B, T, U1 = blank_m.shape
    U = U1 - 1
    t_grid = jnp.arange(T + 1)[None, :]
    terminal_t = jnp.where(t_grid == xlen[:, None], 0.0, NEG)  # (B, T+1)

    # column u=U: no label transitions out
    bU = jnp.where(ylen[:, None] == U, terminal_t, NEG)
    cU = blank_m[:, :, U]
    betaU = log_linear_scan_rev(
        jnp.concatenate([cU, jnp.full((B, 1), NEG)], axis=1), bU, axis=1)

    blank_cols = jnp.moveaxis(blank_m[:, :, :U], 2, 0)  # (U, B, T) u=0..U-1
    label_cols = jnp.moveaxis(label_m, 2, 0)            # (U, B, T) u=0..U-1
    u_idx = jnp.arange(U)

    def col_step(beta_next, cols):
        u, blank_c, label_c = cols
        term = jnp.where(ylen[:, None] == u, terminal_t, NEG)
        b_body = jnp.logaddexp(
            jnp.concatenate(
                [label_c + beta_next[:, :T], jnp.full((B, 1), NEG)], axis=1),
            term)
        # note: label transition (t,u)→(t,u+1) lands on beta_next at SAME t
        c = jnp.concatenate([blank_c, jnp.full((B, 1), NEG)], axis=1)
        beta_u = log_linear_scan_rev(c, b_body, axis=1)
        return beta_u, beta_u

    _, betas = lax.scan(col_step, betaU,
                        (u_idx, blank_cols, label_cols), reverse=True)
    beta = jnp.concatenate([jnp.moveaxis(betas, 0, 1), betaU[:, None]],
                           axis=1)  # (B, U+1, T+1)
    return jnp.moveaxis(beta, 1, 2)


# ---------------------------------------------------------------------------
# custom-vjp core on (blank_lp, label_lp)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def rnnt_loss_core(blank_lp, label_lp, xlen, ylen):
    """Per-sample negative log-likelihood (B,) from transition log-probs."""
    loss, _ = _core_fwd(blank_lp, label_lp, xlen, ylen)
    return loss


def _core_fwd(blank_lp, label_lp, xlen, ylen):
    blank_m, label_m = _masked_transitions(blank_lp, label_lp, xlen, ylen)
    alpha = _alpha(blank_m, label_m)
    B = alpha.shape[0]
    logz = alpha[jnp.arange(B), xlen, ylen]
    loss = -logz
    return loss, (blank_m, label_m, alpha, logz, xlen, ylen)


def _core_bwd(res, g):
    blank_m, label_m, alpha, logz, xlen, ylen = res
    B, T, U1 = blank_m.shape
    beta = _beta(blank_m, label_m, xlen, ylen)
    z = logz[:, None, None]
    # posterior of using each transition; invalid ones underflow to 0
    occ_blank = jnp.exp(
        alpha[:, :T, :] + blank_m + beta[:, 1:, :] - z)
    occ_label = jnp.exp(
        alpha[:, :T, :U1 - 1] + label_m + beta[:, :T, 1:] - z)
    gb = -occ_blank * g[:, None, None]
    gl = -occ_label * g[:, None, None]
    return gb, gl, None, None


rnnt_loss_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def _gather_lp(log_probs, labels, blank):
    """Split full log-probs into blank (B,T,U+1) and label (B,T,U) parts."""
    U = labels.shape[1]
    blank_lp = log_probs[..., blank]
    label_lp = jnp.take_along_axis(
        log_probs[:, :, :U, :], labels[:, None, :, None].astype(jnp.int32),
        axis=-1)[..., 0]
    return blank_lp, label_lp


def gather_normalized_lp(logits, labels, blank):
    """blank/label log-probs straight from raw logits: ONE logsumexp
    reduction, only the two gathered entries normalized — the full
    normalized (B, T, U+1, V) tensor is never written to HBM."""
    u = labels.shape[1]
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    blank_lp = logits[..., blank].astype(jnp.float32) - lse
    label_lp = jnp.take_along_axis(
        logits[:, :, :u, :], labels[:, None, :, None].astype(jnp.int32),
        axis=-1)[..., 0].astype(jnp.float32) - lse[:, :, :u]
    return blank_lp, label_lp


def rnnt_loss(logits, labels, xlen, ylen, blank=0):
    """Per-sample RNN-T loss (B,) from full-lattice logits (B, T, U+1, V).

    Same contract as warprnnt_pytorch.RNNTLoss with reduction='none'."""
    blank_lp, label_lp = gather_normalized_lp(logits, labels, blank)
    return default_core()(blank_lp, label_lp,
                          xlen.astype(jnp.int32), ylen.astype(jnp.int32))


def rnnt_loss_from_joint(joint_params, h_enc, h_dec, labels, xlen, ylen,
                         blank=0, time_chunk=24):
    """Memory-efficient RNN-T loss fusing the joint network.

    h_enc: (B, T, E) encoder output; h_dec: (B, U+1, D) prediction-net output
    (BOS-prepended); labels (B, U).  The (B, T, U+1, V) logits are only ever
    materialized `time_chunk` frames at a time (forward AND backward, via
    rematerialization), while the α/β DP runs on the small (B, T, U+1)
    transition tensors.

    time_chunk=24 is the measured optimum at E6D2 scale on a v5e chip
    (scripts/bench_train_step.py sweep: 24 → 38.2 ms/step 40.0% MFU,
    16 → 38.6, 32 → 43.2, 64 → 61.8 — smaller live chunks reduce HBM
    pressure until scan overhead takes over).
    """
    from edgedict_tpu.models.transducer import joint_project
    from edgedict_tpu.ops.layers import linear

    B, T, E = h_enc.shape
    U1 = h_dec.shape[1]
    f, g = joint_project(joint_params, h_enc, h_dec)  # (B,T,J), (B,U1,J)

    from edgedict_tpu.ops import rnn as rnn_ops
    from edgedict_tpu.ops.joint_lse_pallas import (
        fused_joint_lse, joint_lse_eligible)
    w_out = joint_params['out']['w']                  # (V, J)
    if joint_lse_eligible(U1, f.shape[-1], w_out.shape[0]):
        # fused Pallas path: joint-out matmul + logsumexp + gathers in one
        # kernel, (B,T,U1,V) logits never reach HBM (see joint_lse_pallas).
        # pallas_call can't be GSPMD-partitioned: under an active mesh the
        # kernel runs per-shard via shard_map; a multi-device session
        # WITHOUT a mesh context falls back to the XLA path (the same
        # routing contract as the Pallas LSTM, ops/rnn.py).
        ctx = rnn_ops.current_mesh()
        local = ctx == rnn_ops._SHARD_LOCAL
        shards = rnn_ops.axis_size(ctx[0], ctx[1]) \
            if (ctx and not local) else 1
        args = (f, g, jnp.swapaxes(w_out, 0, 1), joint_params['out']['b'],
                labels.astype(jnp.int32), blank)
        if ctx is not None and not local and shards > 1:
            if B % shards == 0:
                # one shard_map runs BOTH the fused joint kernel and the
                # lattice core per batch shard — neither pallas_call ever
                # meets GSPMD, and the (B,T,U1) transition tensors stay
                # on their shard
                from jax.sharding import PartitionSpec as P
                from edgedict_tpu.ops.rnn_pallas import _shard_map
                ax = ctx[1]

                def body(f_, g_, w_, b_, l_, xl_, yl_):
                    with rnn_ops.shard_local_context():
                        bl, la = fused_joint_lse(f_, g_, w_, b_, l_, blank)
                        return default_core()(bl, la, xl_, yl_)

                fn = _shard_map(
                    body, mesh=ctx[0],
                    in_specs=(P(ax, None, None), P(ax, None, None),
                              P(None, None), P(None), P(ax, None),
                              P(ax), P(ax)),
                    out_specs=P(ax))
                return fn(*args[:5], xlen.astype(jnp.int32),
                          ylen.astype(jnp.int32))
        elif local or jax.device_count() == 1:
            blank_lp, label_lp = fused_joint_lse(*args)
            return default_core()(blank_lp, label_lp,
                                  xlen.astype(jnp.int32),
                                  ylen.astype(jnp.int32))

    pad_t = (-T) % time_chunk
    if pad_t:
        f = jnp.pad(f, ((0, 0), (0, pad_t), (0, 0)))
    n_chunks = f.shape[1] // time_chunk
    f_chunks = f.reshape(B, n_chunks, time_chunk, -1).swapaxes(0, 1)

    labels_i = labels.astype(jnp.int32)

    @jax.checkpoint
    def chunk_lp(f_c, g_full):
        h = jnp.tanh(f_c[:, :, None, :] + g_full[:, None, :, :])
        logits = linear(joint_params['out'], h)
        # normalize only the two gathered entries: one logsumexp reduction
        # instead of materializing the full normalized (B, chunk, U1, V)
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)          # (B, c, U1)
        blank_lp = logits[..., blank].astype(jnp.float32) - lse
        u = labels_i.shape[1]
        label_lp = jnp.take_along_axis(
            logits[:, :, :u, :], labels_i[:, None, :, None],
            axis=-1)[..., 0].astype(jnp.float32) - lse[:, :, :u]
        return blank_lp, label_lp

    def scan_body(_, f_c):
        return None, chunk_lp(f_c, g)

    _, (blank_c, label_c) = lax.scan(scan_body, None, f_chunks)
    blank_lp = blank_c.swapaxes(0, 1).reshape(B, -1, U1)[:, :T]
    label_lp = label_c.swapaxes(0, 1).reshape(B, -1, U1 - 1)[:, :T]
    return default_core()(blank_lp, label_lp,
                          xlen.astype(jnp.int32), ylen.astype(jnp.int32))


# ---------------------------------------------------------------------------
# slow reference implementation (autodiff oracle for tests)
# ---------------------------------------------------------------------------

def rnnt_loss_reference(logits, labels, xlen, ylen, blank=0):
    """Nested-scan log-space DP.  Differentiable via plain jax.grad."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp, label_lp = _gather_lp(log_probs, labels, blank)
    blank_m, label_m = _masked_transitions(
        blank_lp, label_lp, xlen.astype(jnp.int32), ylen.astype(jnp.int32))
    B, T, U1 = blank_m.shape
    # straightforward O(T·U) cell-by-cell DP (tiny test sizes only)
    alpha = jnp.full((B, T + 1, U1), NEG)
    alpha = alpha.at[:, 0, 0].set(0.0)
    for t in range(T + 1):
        for u in range(U1):
            if t == 0 and u == 0:
                continue
            prev = jnp.full((B,), NEG)
            if t > 0:
                prev = jnp.logaddexp(
                    prev, alpha[:, t - 1, u] + blank_m[:, t - 1, u])
            if u > 0 and t < T:
                # label transitions exist only at t < T (jnp would silently
                # CLAMP an out-of-bounds t == T read to t == T−1, admitting
                # phantom paths — caught by the C++/brute-force cross-check)
                prev = jnp.logaddexp(
                    prev, alpha[:, t, u - 1] + label_m[:, t, u - 1])
            alpha = alpha.at[:, t, u].set(prev)
    logz = alpha[jnp.arange(B), xlen, ylen]
    return -logz
