"""Fused joint + log-softmax-gather Pallas kernel for the RNN-T loss.

The lattice loss only needs TWO normalized entries per (t, u) cell — the
blank and the next-label log-probs (ops/rnnt_loss.py).  The XLA path gets
there by materializing (B, chunk, U+1, V) logits in HBM, reducing a
logsumexp over V, and gathering: at E6D2 scale that is ~0.4 GB of HBM
round trips per step and measured ~48% of the joint's FLOP bound
(scripts/profile_train_step.py).

This kernel computes, per ROWS-row block held entirely in VMEM
(flash-softmax style):

    h      = tanh(f[b,t,:] + g[b,u,:])          # joint pre-activation
    logits = h @ W_out + b_out                  # MXU, fp32 accumulate
    lse    = logsumexp(logits, axis=V)
    out    = (logits[:, blank] - lse, logits[:, label[b,u]] - lse)

so the (…, V) logits NEVER touch HBM — only f, g, W and the tiny
(B, T, U+1) outputs move.  The backward kernel recomputes h/logits the
same way (lse is the only saved residual), forms

    dlogits = d_b·1_blank + d_l·1_label − (d_b + d_l)·softmax(logits)

and reduces dW/db/df/dg on the fly: dW/db live in VMEM accumulators
revisited across the whole grid, dg accumulates per batch row.

Layout notes (Mosaic):
  * rows of one block are (t, u) pairs of ONE batch element — R_U = U+1
    rounded up to a power of two (≤ROWS) and R_T = ROWS // R_U time
    steps, so every MXU call sees ROWS rows regardless of label length;
  * per-row scalars (lse, the two outputs, their cotangents) travel as
    plain (B, Tp, r_u) arrays; the (ROWS, 1)-column ↔ (r_t, r_u)-block
    relayout happens IN-KERNEL on VMEM-resident data.  (They used to
    travel as (B, nT, ROWS, 1) — but a (…, 1)-trailing tiled HBM layout
    uses one lane per (8, 128) tile, a 128× physical inflation that
    cost ~1.6 ms/step in out-of-kernel reshapes/reductions);
  * per-row label ids are pre-tiled to the same (B, ROWS, 1) row layout;
  * the grid is (B, nT) with t innermost, so the per-b dg accumulator
    block is revisited consecutively.

Replaces the warp-transducer's fused "logits → loss-grad" role
(SURVEY.md §2.3) one level deeper: even the logits are fusion-local.
Parity: tests/test_joint_lse_pallas.py (fwd + all grads vs the XLA path,
interpret mode; the same kernel compiles on TPU where it is the
production path in rnnt_loss_from_joint).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per MXU block: more rows = fewer grid cells, longer K on the
# backward's dw accumulation matmul, fewer dw-accumulator VMEM revisits —
# at the cost of larger per-block buffers.  On-chip sweep at E6D2/B=32
# (joint+lattice fwd+bwd): 128 → 26.1 ms, 256 → 25.2, 512 → 24.9 (round
# 3) — but 512 exceeds scoped VMEM inside the FULL train step (the
# standalone sweep had more headroom), so 256 is the default;
# env-tunable for sweeps.
ROWS = int(os.environ.get('EDGEDICT_JOINT_ROWS', '256'))


def _interpret():
    return jax.default_backend() != 'tpu'


def _row_blocking(u1):
    """(R_U, R_T) with R_U * R_T == ROWS and R_U >= u1, or None."""
    r_u = 8
    while r_u < u1:
        r_u *= 2
    if r_u > ROWS:
        return None
    return r_u, ROWS // r_u


_warned_envelope = False


def _warn_u_envelope(u1):
    """One-time notice when ONLY the U envelope disengages the kernel.

    Falling off the fused path at production shapes is a measured ~17x
    device-step regression (VALIDATION.md 5c: 84.7 ms -> 1479 ms at
    U~390), and it is silent at runtime — the XLA chunked-joint fallback
    is numerically identical.  Warn once, at trace time, so a long-
    transcript corpus can't quietly burn the whole step budget."""
    global _warned_envelope
    if not _warned_envelope:
        _warned_envelope = True
        import warnings
        warnings.warn(
            f'fused joint+LSE kernel disengaged: U+1={u1} exceeds the '
            f'row envelope (EDGEDICT_JOINT_ROWS={ROWS}); the train/loss '
            f'step takes the ~17x-slower chunked XLA joint.  Raise '
            f'EDGEDICT_JOINT_ROWS to the next pow2 >= {u1} (costs VMEM) '
            f'or cap transcript length (see VALIDATION.md 5c).',
            stacklevel=3)


def joint_lse_eligible(u1, joint_size, vocab):
    mode = os.environ.get('EDGEDICT_PALLAS_JOINT', '1')
    if mode == '0':
        return False
    if mode != 'force' and jax.default_backend() != 'tpu':
        return False
    aligned = joint_size % 128 == 0 and vocab % 128 == 0
    if aligned and _row_blocking(u1) is None:
        # production-shaped operands where ONLY the U envelope fails:
        # the one case that silently swaps a kernel for a 17x fallback
        _warn_u_envelope(u1)
    return _row_blocking(u1) is not None and aligned


def _col_to_block(col, r_t, r_u):
    """(ROWS, 1) per-row column → (r_t, r_u) block, Mosaic-safe.

    A direct reshape is a sublane→lane relayout Mosaic refuses
    ("unsupported shape cast").  Instead: scatter each row's value to
    its target lane by mask (m[i, b] = col[i]·[i%r_u == b]), split the
    sublane dim (free — leading-dim reshape), and reduce the r_u
    group-local sublanes.  VPU-only, no MXU."""
    rows = r_t * r_u
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, r_u), 1)
    irow = jax.lax.broadcasted_iota(jnp.int32, (rows, r_u), 0)
    m = jnp.where(irow % r_u == lane, col, 0.0)
    return jnp.sum(m.reshape(r_t, r_u, r_u), axis=1)


def _block_to_col(x, r_t, r_u):
    """(r_t, r_u) block → (ROWS, 1) per-row column (inverse of
    _col_to_block: sublane broadcast + masked lane reduce, VPU-only)."""
    rows = r_t * r_u
    y = jnp.broadcast_to(x.astype(jnp.float32)[:, None, :],
                         (r_t, r_u, r_u)).reshape(rows, r_u)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, r_u), 1)
    irow = jax.lax.broadcasted_iota(jnp.int32, (rows, r_u), 0)
    return jnp.sum(jnp.where(irow % r_u == lane, y, 0.0), axis=1,
                   keepdims=True)


def _gather_col(logits, cols, idx, keep=True):
    """Per-row column gather as a masked sum (avoids 1-lane slicing)."""
    return jnp.sum(jnp.where(cols == idx, logits, 0.0), axis=1,
                   keepdims=keep)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(f_ref, g_ref, w_ref, bias_ref, lbl_ref,
                blank_ref, label_ref, lse_ref, *, blank, r_t, r_u):
    j = f_ref.shape[-1]
    h = jnp.tanh(f_ref[0, 0][:, None, :].astype(jnp.float32)
                 + g_ref[0][None, :, :].astype(jnp.float32))
    hb = h.reshape(ROWS, j).astype(w_ref.dtype)
    logits = jax.lax.dot_general(
        hb, w_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bias_ref[:, :]
    m = jnp.max(logits, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))

    v = logits.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, v), 1)
    lbl = lbl_ref[0]                                   # (ROWS, 1) int32
    # per-row (ROWS, 1) columns relayout to (r_t, r_u) IN-KERNEL: the
    # HBM arrays stay (B, Tp, r_u) — a (…, 1)-trailing tiled layout in
    # HBM occupies one lane per (8, 128) tile, a 128× physical
    # inflation that made the out-of-kernel reshape cost ~0.6 ms/step
    blank_ref[0, 0] = _col_to_block(
        _gather_col(logits, cols, blank) - lse, r_t, r_u)
    label_ref[0, 0] = _col_to_block(
        _gather_col(logits, cols, lbl) - lse, r_t, r_u)
    lse_ref[0, 0] = _col_to_block(lse, r_t, r_u)


def _fwd_kernel_split(f_ref, g_ref, w_ref, bias_ref, lbl_ref,
                      blank_ref, label_ref, lse_ref, *, blank, r_t, r_u,
                      cb):
    """Column-blocked forward: flash-softmax running (max, sum) over V in
    `cb`-lane blocks, so block i's VPU exp/sum work can overlap block
    i+1's MXU matmul (the whole-V kernel runs one big matmul then a
    VPU-only logsumexp tail — the round-4 trace put that tail at ~3-5 ms
    of the B=64 step with only partial overlap, VALIDATION.md §3c).  The
    per-row blank/label gathers are raw logits, independent of the
    normalizer, so they accumulate per block without rescaling.
    Same outputs as _fwd_kernel to the last ulp-ish (exp/rescale order
    differs; parity asserted in tests at 1e-5)."""
    j = f_ref.shape[-1]
    v = w_ref.shape[1]
    h = jnp.tanh(f_ref[0, 0][:, None, :].astype(jnp.float32)
                 + g_ref[0][None, :, :].astype(jnp.float32))
    hb = h.reshape(ROWS, j).astype(w_ref.dtype)
    lbl = lbl_ref[0]                                   # (ROWS, 1) int32
    m = jnp.full((ROWS, 1), -jnp.inf, jnp.float32)
    s = jnp.zeros((ROWS, 1), jnp.float32)
    b_acc = jnp.zeros((ROWS, 1), jnp.float32)
    l_acc = jnp.zeros((ROWS, 1), jnp.float32)
    for c0 in range(0, v, cb):                         # static unroll
        logits = jax.lax.dot_general(
            hb, w_ref[:, c0:c0 + cb], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bias_ref[:, c0:c0 + cb]
        cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, cb), 1) + c0
        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        s = (s * jnp.exp(m - m_new)
             + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
        m = m_new
        b_acc += _gather_col(logits, cols, blank)
        l_acc += _gather_col(logits, cols, lbl)
    lse = m + jnp.log(s)
    blank_ref[0, 0] = _col_to_block(b_acc - lse, r_t, r_u)
    label_ref[0, 0] = _col_to_block(l_acc - lse, r_t, r_u)
    lse_ref[0, 0] = _col_to_block(lse, r_t, r_u)


def _fwd_col_block(v):
    """Column block for the split forward, from EDGEDICT_JOINT_FWD_COLS
    (lanes per MXU call; 0 = whole-V single-matmul kernel).  Default 512:
    measured on-chip at the B=64 E6D2 headline config in two independent
    sessions, the flash-style split takes the full train step 84.8 →
    83.9 ms and 84.4 → 83.6 ms (−0.8 to −0.9 ms, +0.7% MFU) by letting
    the per-block exp/sum VPU work overlap the next block's matmul
    (scripts/bench_joint_fwd; cols=1024 measured between the two).
    Ineligible vocab sizes (not a multiple of the block) fall back to the
    whole-V kernel."""
    cb = int(os.environ.get('EDGEDICT_JOINT_FWD_COLS', '512'))
    if cb > 0 and cb % 128 == 0 and v % cb == 0 and cb < v:
        return cb
    return 0


def _run_fwd(f, g, w_t, bias, lbl_rows, blank, r_t, r_u):
    B, n_t, _, J = f.shape
    V = w_t.shape[1]
    cb = _fwd_col_block(V)
    if cb:
        kernel = functools.partial(_fwd_kernel_split, blank=blank,
                                   r_t=r_t, r_u=r_u, cb=cb)
    else:
        kernel = functools.partial(_fwd_kernel, blank=blank, r_t=r_t,
                                   r_u=r_u)
    scal = pl.BlockSpec((1, 1, r_t, r_u), lambda b, t: (b, t, 0, 0),
                        memory_space=pltpu.VMEM)
    out3 = [jax.ShapeDtypeStruct((B, n_t, r_t, r_u), jnp.float32)] * 3
    return pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, r_t, J), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_u, J), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[scal, scal, scal],
        out_shape=out3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(f, g, w_t, bias, lbl_rows)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(f_ref, g_ref, w_ref, bias_ref, lbl_ref, lse_ref,
                db_ref, dl_ref, df_ref, dg_ref, dw_ref, dbias_ref,
                dg_s, dw_s, dbias_s, *, blank, r_t, r_u):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    j = f_ref.shape[-1]

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_s[:, :] = jnp.zeros_like(dw_s)
        dbias_s[:, :] = jnp.zeros_like(dbias_s)

    @pl.when(t == 0)
    def _():
        dg_s[:, :] = jnp.zeros_like(dg_s)

    # recompute h and logits — lse is the only saved residual
    h = jnp.tanh(f_ref[0, 0][:, None, :].astype(jnp.float32)
                 + g_ref[0][None, :, :].astype(jnp.float32))
    hb32 = h.reshape(ROWS, j)
    hb = hb32.astype(w_ref.dtype)
    logits = jax.lax.dot_general(
        hb, w_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bias_ref[:, :]

    lse = _block_to_col(lse_ref[0, 0], r_t, r_u)       # → (ROWS, 1)
    d_b = _block_to_col(db_ref[0, 0], r_t, r_u)
    d_l = _block_to_col(dl_ref[0, 0], r_t, r_u)
    v = logits.shape[1]
    p = jnp.exp(logits - lse)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, v), 1)
    lbl = lbl_ref[0]                                   # (ROWS, 1) int32
    dlogits = (jnp.where(cols == blank, d_b, 0.0)
               + jnp.where(cols == lbl, d_l, 0.0)
               - (d_b + d_l) * p)

    dlog_mxu = dlogits.astype(w_ref.dtype)
    dw_s[:, :] += jax.lax.dot_general(
        hb, dlog_mxu, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbias_s[:, :] += jnp.sum(dlogits, axis=0, keepdims=True)

    dh = jax.lax.dot_general(
        dlog_mxu, w_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = (dh * (1.0 - hb32 * hb32)).reshape(r_t, r_u, j)
    df_ref[0, 0] = jnp.sum(da, axis=1).astype(df_ref.dtype)
    dg_s[:, :] += jnp.sum(da, axis=0)

    @pl.when(t == n_t - 1)
    def _():
        dg_ref[0] = dg_s[:, :].astype(dg_ref.dtype)

    @pl.when(jnp.logical_and(b == n_b - 1, t == n_t - 1))
    def _():
        dw_ref[:, :] = dw_s[:, :]
        dbias_ref[:, :] = dbias_s[:, :]


def _run_bwd(f, g, w_t, bias, lbl_rows, lse, d_blank, d_label,
             blank, r_t, r_u):
    B, n_t, _, J = f.shape
    V = w_t.shape[1]
    kernel = functools.partial(_bwd_kernel, blank=blank, r_t=r_t, r_u=r_u)
    scal = pl.BlockSpec((1, 1, r_t, r_u), lambda b, t: (b, t, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, r_t, J), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_u, J), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            scal,                                      # lse
            scal,                                      # d_blank
            scal,                                      # d_label
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r_t, J), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),     # df
            pl.BlockSpec((1, r_u, J), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # dg (per-b revisit)
            pl.BlockSpec((J, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),     # dw (global revisit)
            pl.BlockSpec((1, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),     # dbias
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_t, r_t, J), f.dtype),
            jax.ShapeDtypeStruct((B, r_u, J), g.dtype),
            jax.ShapeDtypeStruct((J, V), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r_u, J), jnp.float32),
            pltpu.VMEM((J, V), jnp.float32),
            pltpu.VMEM((1, V), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(f, g, w_t, bias, lbl_rows, lse, d_blank, d_label)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_joint_lse(f, g, w_t, bias, labels, blank):
    """(f (B,T,J), g (B,U1,J), w_t (J,V) fp32, bias (V,) fp32,
    labels (B,U) int32) → (blank_lp (B,T,U1), label_lp (B,T,U)) —
    normalized log-probs of the blank and next-label transitions, without
    ever materializing the (B,T,U1,V) logits.  MXU math runs in bf16 with
    fp32 accumulation on TPU (matching the XLA path's compute dtype)."""
    out, _ = _vjp_fwd(f, g, w_t, bias, labels, blank)
    return out


def _prep(f, g, labels, blank):
    B, T, _ = f.shape
    U1 = g.shape[1]
    U = labels.shape[1]
    r_u, r_t = _row_blocking(U1)
    pad_t = (-T) % r_t
    f_p = jnp.pad(f, ((0, 0), (0, pad_t), (0, 0))) if pad_t else f
    g_p = jnp.pad(g, ((0, 0), (0, r_u - U1), (0, 0)))
    # padded label slots point at blank — their cotangents are zero (the
    # DP core masks invalid cells) so the gathered value never matters
    labels_p = jnp.pad(labels.astype(jnp.int32),
                       ((0, 0), (0, r_u - U)), constant_values=blank)
    # per-row label ids in block-row order (u fastest within each t)
    lbl_rows = jnp.tile(labels_p, (1, r_t)).reshape(B, ROWS, 1)
    return f_p, g_p, lbl_rows, r_u, r_t, T, U1, U


def _scal_pad(x, Tp, r_t, r_u):
    """(B, T, U1) per-cell scalars → the kernel's (B, nT, r_t, r_u)
    layout (zero pad + contiguous dim split; the (ROWS, 1)-column
    relayout happens in-kernel)."""
    B, T, u = x.shape
    x = jnp.pad(x.astype(jnp.float32),
                ((0, 0), (0, Tp - T), (0, r_u - u)))
    return x.reshape(B, Tp // r_t, r_t, r_u)


def _mxu_dtype(ref_dtype):
    """MXU compute dtype follows the ACTIVATIONS: the production bf16
    train path feeds bf16 f/g (so the joint matmuls run bf16 on the MXU),
    while a --bf16=false run keeps fp32 end to end and matches the XLA
    fallback numerics instead of silently downcasting."""
    return ref_dtype


def _vjp_fwd(f, g, w_t, bias, labels, blank):
    f_p, g_p, lbl_rows, r_u, r_t, T, U1, U = _prep(f, g, labels, blank)
    B, Tp, _ = f_p.shape
    dt = _mxu_dtype(f.dtype)
    f4 = f_p.reshape(B, Tp // r_t, r_t, -1)
    blank_p, label_p, lse_p = _run_fwd(
        f4.astype(dt), g_p.astype(dt), w_t.astype(dt),
        bias.astype(jnp.float32)[None], lbl_rows, blank, r_t, r_u)
    blank_lp = blank_p.reshape(B, Tp, r_u)[:, :T, :U1]
    label_lp = label_p.reshape(B, Tp, r_u)[:, :T, :U]
    return (blank_lp, label_lp), (f, g, w_t, bias, labels, lse_p)


def _vjp_bwd(blank, res, grads):
    f, g, w_t, bias, labels, lse_p = res
    d_blank, d_label = grads
    f_p, g_p, lbl_rows, r_u, r_t, T, U1, U = _prep(f, g, labels, blank)
    B, Tp, _ = f_p.shape
    n_t = Tp // r_t
    db_p = _scal_pad(d_blank, Tp, r_t, r_u)
    dl_p = _scal_pad(d_label, Tp, r_t, r_u)

    dt = _mxu_dtype(f.dtype)
    f4 = f_p.reshape(B, n_t, r_t, -1)
    df4, dg, dw, dbias = _run_bwd(
        f4.astype(dt), g_p.astype(dt), w_t.astype(dt),
        bias.astype(jnp.float32)[None], lbl_rows, lse_p, db_p, dl_p,
        blank, r_t, r_u)
    df = df4.reshape(B, Tp, -1)
    d_labels = np.zeros(labels.shape, jax.dtypes.float0)
    return (df[:, :T].astype(f.dtype), dg[:, :U1].astype(g.dtype),
            dw.astype(w_t.dtype), dbias[0].astype(bias.dtype), d_labels)


fused_joint_lse.defvjp(_vjp_fwd, _vjp_bwd)


def fused_joint_lse_sharded(mesh, f, g, w_t, bias, labels, blank,
                            batch_axis='dp'):
    """Batch-sharded fused joint under shard_map: batch split over
    `batch_axis`, W/bias replicated (their cotangents psum across shards
    via shard_map's AD, same pattern as the Pallas LSTM's W_hh).
    pallas_call is not auto-partitionable under GSPMD — this wrapper is
    what lets the kernel live inside a dp-sharded jitted train step."""
    from jax.sharding import PartitionSpec as P

    from edgedict_tpu.ops.rnn_pallas import _shard_map

    fn = _shard_map(
        lambda f_, g_, w_, b_, l_: fused_joint_lse(f_, g_, w_, b_, l_,
                                                   blank),
        mesh=mesh,
        in_specs=(P(batch_axis, None, None), P(batch_axis, None, None),
                  P(None, None), P(None), P(batch_axis, None)),
        out_specs=(P(batch_axis, None, None), P(batch_axis, None, None)))
    return fn(f, g, w_t, bias, labels)
