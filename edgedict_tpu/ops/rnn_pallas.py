"""Pallas TPU kernel for the LSTM time recurrence — the encoder's hot loop.

The scan-based layer (ops/rnn.py) hoists the input projection into one big
MXU matmul and scans the small recurrence; XLA compiles that scan as a
device loop.  This kernel replaces the scan with a Pallas grid over T: TPU
grid steps execute sequentially with automatic HBM↔VMEM pipelining of the
per-step tiles, while (h, c) live in VMEM scratch across steps and the
recurrent weight stays VMEM-resident.  Per step: one (B,H)@(H,4H) MXU
matmul + fused VPU gates.

Work split (keeps VMEM small and MXU fed):
  * forward kernel: the full recurrence; emits ys and the cell sequence.
  * backward: XLA recomputes the gate activations with ONE big matmul
    (x_proj + ys_prev @ W_hh^T — standard rematerialization), the kernel
    runs only the sequential dh/dc chain (elementwise + one (B,4H)@(4H,H)
    matmul per step), and dW_hh/db reduce OUTSIDE as one big matmul over
    the emitted dgates.

`lstm_recurrence_pallas` is a custom-vjp drop-in for the scan recurrence
(PyTorch gate order i,f,g,o; fp32 state).  Interpret mode keeps CPU tests
hermetic.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != 'tpu'


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xp_ref, whh_ref, h0_ref, c0_ref,
                ys_ref, cs_ref, hT_ref, cT_ref, h_s, c_s, *, t_len):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:, :] = h0_ref[:, :]
        c_s[:, :] = c0_ref[:, :]

    h = h_s[:, :]
    c = c_s[:, :]
    gates = xp_ref[0] + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:, :],
        preferred_element_type=jnp.float32)
    hdim = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hdim])
    f = jax.nn.sigmoid(gates[:, hdim:2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    ys_ref[0] = h
    cs_ref[0] = c
    h_s[:, :] = h
    c_s[:, :] = c
    hT_ref[:, :] = h
    cT_ref[:, :] = c


def _lstm_cell(gates, c):
    hdim = c.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hdim])
    f = jax.nn.sigmoid(gates[:, hdim:2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim:])
    c = f * c + i * g
    return o * jnp.tanh(c), c


def _fwd_kernel2(xp_ref, whh_ref, h0_ref, c0_ref,
                 ys_ref, cs_ref, hT_ref, cT_ref, h_s, c_s, *, t_len):
    """Two time steps per grid step: same matmul/VPU work, half the grid
    iterations — the per-step pipeline/semaphore overhead was the dominant
    cost at B≈32 (the matmuls are M-streamed, not 128-row-padded)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:, :] = h0_ref[:, :]
        c_s[:, :] = c0_ref[:, :]

    h = h_s[:, :]
    c = c_s[:, :]
    for k in range(2):
        gates = xp_ref[k] + jnp.dot(
            h.astype(whh_ref.dtype), whh_ref[:, :],
            preferred_element_type=jnp.float32)
        h, c = _lstm_cell(gates, c)
        ys_ref[k] = h
        cs_ref[k] = c
    h_s[:, :] = h
    c_s[:, :] = c
    hT_ref[:, :] = h
    cT_ref[:, :] = c


def _run_fwd(x_proj, w_hh_t, h0, c0):
    # time-major internally: Mosaic needs the last two block dims
    # tile-aligned, so T is the leading (grid) axis
    x_proj = jnp.swapaxes(x_proj, 0, 1)        # (T, B, 4H)
    T, B, H4 = x_proj.shape
    H = H4 // 4
    steps = 2 if T % 2 == 0 and T >= 4 else 1
    if steps == 2:
        kernel = functools.partial(_fwd_kernel2, t_len=T)
    else:
        kernel = functools.partial(_fwd_kernel, t_len=T)
    ys, cs, hT, cT = pl.pallas_call(
        kernel,
        grid=(T // steps,),
        in_specs=[
            pl.BlockSpec((steps, B, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((steps, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, h0, c0)
    return (jnp.swapaxes(ys, 0, 1), jnp.swapaxes(cs, 0, 1), hT, cT)


# ---------------------------------------------------------------------------
# backward (sequential part only)
# ---------------------------------------------------------------------------

def _bwd_kernel(acts_ref, cprev_ref, c_ref, dys_ref, whh_t_ref,
                dhT_ref, dcT_ref, dg_ref, dh0_ref, dc0_ref, dh_s, dc_s,
                *, t_len):
    s = pl.program_id(0)          # processes t = T−1−s

    @pl.when(s == 0)
    def _():
        dh_s[:, :] = dhT_ref[:, :]
        dc_s[:, :] = dcT_ref[:, :]

    hdim = dh_s.shape[-1]
    acts = acts_ref[0]
    i = acts[:, :hdim]
    f = acts[:, hdim:2 * hdim]
    g = acts[:, 2 * hdim:3 * hdim]
    o = acts[:, 3 * hdim:]
    c_prev = cprev_ref[0]
    tanh_c = jnp.tanh(c_ref[0])

    dh = dys_ref[0] + dh_s[:, :]
    do = dh * tanh_c
    dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_s[:, :]
    dgates = jnp.concatenate(
        [dc * g * i * (1.0 - i),
         dc * c_prev * f * (1.0 - f),
         dc * i * (1.0 - g * g),
         do * o * (1.0 - o)], axis=1)                      # (B, 4H)
    dg_ref[0] = dgates
    dh_prev = jnp.dot(dgates.astype(whh_t_ref.dtype), whh_t_ref[:, :],
                      preferred_element_type=jnp.float32)
    dc_prev = dc * f
    dh_s[:, :] = dh_prev
    dc_s[:, :] = dc_prev
    dh0_ref[:, :] = dh_prev
    dc0_ref[:, :] = dc_prev


def _bwd_step(acts, c_prev, c, dy, dh_in, dc_in, whh_t_ref):
    """One reverse step of the dh/dc chain; returns (dgates, dh_prev,
    dc_prev)."""
    hdim = dh_in.shape[-1]
    i = acts[:, :hdim]
    f = acts[:, hdim:2 * hdim]
    g = acts[:, 2 * hdim:3 * hdim]
    o = acts[:, 3 * hdim:]
    tanh_c = jnp.tanh(c)
    dh = dy + dh_in
    do = dh * tanh_c
    dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_in
    dgates = jnp.concatenate(
        [dc * g * i * (1.0 - i),
         dc * c_prev * f * (1.0 - f),
         dc * i * (1.0 - g * g),
         do * o * (1.0 - o)], axis=1)                  # (B, 4H)
    dh_prev = jnp.dot(dgates.astype(whh_t_ref.dtype), whh_t_ref[:, :],
                      preferred_element_type=jnp.float32)
    return dgates, dh_prev, dc * f


def _bwd_kernel2(acts_ref, cprev_ref, c_ref, dys_ref, whh_t_ref,
                 dhT_ref, dcT_ref, dg_ref, dh0_ref, dc0_ref, dh_s, dc_s,
                 *, t_len):
    """Two reverse time steps per grid step (row 1 = later t first)."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        dh_s[:, :] = dhT_ref[:, :]
        dc_s[:, :] = dcT_ref[:, :]

    dh = dh_s[:, :]
    dc = dc_s[:, :]
    for k in (1, 0):
        dgates, dh, dc = _bwd_step(
            acts_ref[k], cprev_ref[k], c_ref[k], dys_ref[k], dh, dc,
            whh_t_ref)
        dg_ref[k] = dgates
    dh_s[:, :] = dh
    dc_s[:, :] = dc
    dh0_ref[:, :] = dh
    dc0_ref[:, :] = dc


def _run_bwd(acts, cs_prev, cs, dys, w_hh_t, dhT, dcT):
    acts = jnp.swapaxes(acts, 0, 1)            # (T, B, 4H)
    cs_prev = jnp.swapaxes(cs_prev, 0, 1)
    cs = jnp.swapaxes(cs, 0, 1)
    dys = jnp.swapaxes(dys, 0, 1)
    T, B, H4 = acts.shape
    H = H4 // 4
    steps = 2 if T % 2 == 0 and T >= 4 else 1
    if steps == 2:
        kernel = functools.partial(_bwd_kernel2, t_len=T)
        rev3 = lambda s: (T // 2 - 1 - s, 0, 0)
    else:
        kernel = functools.partial(_bwd_kernel, t_len=T)
        rev3 = lambda s: (T - 1 - s, 0, 0)
    fixed = lambda s: (0, 0)
    dgates, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(T // steps,),
        in_specs=[
            pl.BlockSpec((steps, B, H4), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((steps, B, H4), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(acts, cs_prev, cs, dys, w_hh_t, dhT, dcT)
    return jnp.swapaxes(dgates, 0, 1), dh0, dc0


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def lstm_recurrence_pallas(x_proj, w_hh_t, h0, c0):
    """(x_proj (B,T,4H) fp32 incl. bias, w_hh_t (H,4H), h0/c0 (B,H) fp32) →
    (ys (B,T,H), hT (B,H), cT (B,H)) — the LSTM recurrence as one Pallas
    kernel (PyTorch gate order i,f,g,o)."""
    ys, cs, hT, cT = _run_fwd(x_proj, w_hh_t, h0, c0)
    return ys, hT, cT


def _vjp_fwd(x_proj, w_hh_t, h0, c0):
    ys, cs, hT, cT = _run_fwd(x_proj, w_hh_t, h0, c0)
    return (ys, hT, cT), (x_proj, w_hh_t, h0, c0, ys, cs)


def _vjp_bwd(res, grads):
    x_proj, w_hh_t, h0, c0, ys, cs = res
    dys, dhT, dcT = grads
    B, T, H4 = x_proj.shape
    H = H4 // 4

    ys_prev = jnp.concatenate([h0[:, None], ys[:, :-1]], axis=1)
    cs_prev = jnp.concatenate([c0[:, None], cs[:, :-1]], axis=1)
    # rematerialize gate activations with one big MXU matmul
    gates = x_proj + jax.lax.dot_general(
        ys_prev, w_hh_t, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acts = jnp.concatenate(
        [jax.nn.sigmoid(gates[..., :H]),
         jax.nn.sigmoid(gates[..., H:2 * H]),
         jnp.tanh(gates[..., 2 * H:3 * H]),
         jax.nn.sigmoid(gates[..., 3 * H:])], axis=-1)

    dgates, dh0, dc0 = _run_bwd(
        acts, cs_prev, cs, dys.astype(jnp.float32),
        jnp.swapaxes(w_hh_t, 0, 1), dhT.astype(jnp.float32),
        dcT.astype(jnp.float32))

    # weight grad reduces OUTSIDE as one big matmul over all steps
    dwhh_t = jax.lax.dot_general(
        ys_prev.reshape(B * T, H), dgates.reshape(B * T, H4),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # cotangent dtypes must match the primals (w_hh_t may be bf16)
    return dgates, dwhh_t.astype(w_hh_t.dtype), dh0, dc0


lstm_recurrence_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_layer_pallas(params, xs, state, recurrent_dtype=None, mesh=None,
                      batch_axis='dp'):
    """Drop-in for rnn_ops.lstm_layer backed by the Pallas recurrence.

    recurrent_dtype: dtype of the VMEM-resident W_hh.  Defaults to bf16 on
    TPU — a (H,4H) fp32 weight alone fills the 16 MB VMEM — and fp32
    elsewhere (bit-parity with the scan layer for tests).  Gate math always
    accumulates fp32.

    mesh: when given (and the batch axis has >1 shard), the sequential
    recurrence runs per-shard under shard_map with the batch split over
    `batch_axis` and weights replicated — the wiring that lets the kernel
    live inside a dp-sharded jitted train step (the input projection stays
    outside in GSPMD-land where XLA partitions it natively)."""
    if recurrent_dtype is None:
        recurrent_dtype = (jnp.bfloat16 if jax.default_backend() == 'tpu'
                           else jnp.float32)
    h0, c0 = state
    dtype = xs.dtype
    w_ih = params['w_ih'].astype(dtype)
    bias = (params['b_ih'] + params['b_hh']).astype(jnp.float32)
    x_proj = jax.lax.dot_general(
        xs, w_ih, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    w_hh_t = jnp.swapaxes(params['w_hh'], 0, 1).astype(recurrent_dtype)
    if mesh is not None and dict(mesh.shape).get(batch_axis, 1) > 1:
        ys, hT, cT = lstm_recurrence_pallas_sharded(
            mesh, x_proj, w_hh_t, h0.astype(jnp.float32),
            c0.astype(jnp.float32), batch_axis=batch_axis)
    else:
        ys, hT, cT = lstm_recurrence_pallas(
            x_proj, w_hh_t, h0.astype(jnp.float32), c0.astype(jnp.float32))
    return ys.astype(dtype), (hT.astype(h0.dtype), cT.astype(c0.dtype))


# ---------------------------------------------------------------------------
# GRU variant (torch gate semantics r,z,n; reference enc_type=GRU)
# ---------------------------------------------------------------------------

def _gru_fwd_kernel(xp_ref, whh_ref, bhh_ref, h0_ref,
                    ys_ref, hT_ref, h_s, *, t_len):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:, :] = h0_ref[:, :]

    h = h_s[:, :]
    h_proj = jnp.dot(h.astype(whh_ref.dtype), whh_ref[:, :],
                     preferred_element_type=jnp.float32) + bhh_ref[0]
    hdim = h.shape[-1]
    xp = xp_ref[0]
    r = jax.nn.sigmoid(xp[:, :hdim] + h_proj[:, :hdim])
    z = jax.nn.sigmoid(xp[:, hdim:2 * hdim] + h_proj[:, hdim:2 * hdim])
    n = jnp.tanh(xp[:, 2 * hdim:] + r * h_proj[:, 2 * hdim:])
    h = (1.0 - z) * n + z * h
    ys_ref[0] = h
    h_s[:, :] = h
    hT_ref[:, :] = h


def _gru_run_fwd(x_proj, w_hh_t, b_hh, h0):
    x_proj = jnp.swapaxes(x_proj, 0, 1)         # (T, B, 3H)
    T, B, H3 = x_proj.shape
    H = H3 // 3
    kernel = functools.partial(_gru_fwd_kernel, t_len=T)
    ys, hT = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, b_hh[None], h0)
    return jnp.swapaxes(ys, 0, 1), hT


def _gru_bwd_kernel(acts_ref, hn_ref, hprev_ref, dys_ref, whh_ref,
                    dhT_ref, dgx_ref, dgh_ref, dh0_ref, dh_s, *, t_len):
    """Sequential dh chain of the GRU backward (torch gate semantics).

    Per step (processed in reverse time order): elementwise gate grads +
    ONE (B,3H)@(3H,H) MXU matmul.  Emits dgx (→ dx_proj) and dgh
    (→ dW_hh/db_hh, reduced outside as one big matmul)."""
    s = pl.program_id(0)               # processes t = T−1−s

    @pl.when(s == 0)
    def _():
        dh_s[:, :] = dhT_ref[:, :]

    hdim = dh_s.shape[-1]
    acts = acts_ref[0]
    r = acts[:, :hdim]
    z = acts[:, hdim:2 * hdim]
    n = acts[:, 2 * hdim:]
    hn = hn_ref[0]
    h_prev = hprev_ref[0]

    dh = dys_ref[0] + dh_s[:, :]
    dn = dh * (1.0 - z)
    dz = dh * (h_prev - n)
    da_n = dn * (1.0 - n * n)
    dhn = da_n * r
    dr = da_n * hn
    da_r = dr * r * (1.0 - r)
    da_z = dz * z * (1.0 - z)
    dgx = jnp.concatenate([da_r, da_z, da_n], axis=1)    # (B, 3H)
    dgh = jnp.concatenate([da_r, da_z, dhn], axis=1)
    dgx_ref[0] = dgx
    dgh_ref[0] = dgh
    dh_prev = dh * z + jnp.dot(dgh.astype(whh_ref.dtype), whh_ref[:, :],
                               preferred_element_type=jnp.float32)
    dh_s[:, :] = dh_prev
    dh0_ref[:, :] = dh_prev


def _gru_run_bwd(acts, hn, ys_prev, dys, w_hh, dhT):
    acts = jnp.swapaxes(acts, 0, 1)          # (T, B, 3H)
    hn = jnp.swapaxes(hn, 0, 1)
    ys_prev = jnp.swapaxes(ys_prev, 0, 1)
    dys = jnp.swapaxes(dys, 0, 1)
    T, B, H3 = acts.shape
    H = H3 // 3
    kernel = functools.partial(_gru_bwd_kernel, t_len=T)
    rev3 = lambda s: (T - 1 - s, 0, 0)
    fixed = lambda s: (0, 0)
    dgx, dgh, dh0 = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H3), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H3), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H3), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H3), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(acts, hn, ys_prev, dys, w_hh, dhT)
    return jnp.swapaxes(dgx, 0, 1), jnp.swapaxes(dgh, 0, 1), dh0


@jax.custom_vjp
def gru_recurrence_pallas(x_proj, w_hh_t, b_hh, h0):
    """(x_proj (B,T,3H) fp32 incl. b_ih, w_hh_t (H,3H), b_hh (3H,),
    h0 (B,H) fp32) → (ys (B,T,H), hT (B,H)) — the GRU recurrence as one
    Pallas kernel (torch gate order r,z,n; b_hh applied inside the reset
    gate, matching nn.GRU)."""
    ys, hT = _gru_run_fwd(x_proj, w_hh_t, b_hh, h0)
    return ys, hT


def _gru_vjp_fwd(x_proj, w_hh_t, b_hh, h0):
    ys, hT = _gru_run_fwd(x_proj, w_hh_t, b_hh, h0)
    return (ys, hT), (x_proj, w_hh_t, b_hh, h0, ys)


def _gru_vjp_bwd(res, grads):
    x_proj, w_hh_t, b_hh, h0, ys = res
    dys, dhT = grads
    B, T, H3 = x_proj.shape
    H = H3 // 3

    ys_prev = jnp.concatenate([h0[:, None], ys[:, :-1]], axis=1)
    # rematerialize gate activations with one big MXU matmul
    h_proj = jax.lax.dot_general(
        ys_prev, w_hh_t, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_hh.astype(jnp.float32)
    r = jax.nn.sigmoid(x_proj[..., :H] + h_proj[..., :H])
    z = jax.nn.sigmoid(x_proj[..., H:2 * H] + h_proj[..., H:2 * H])
    hn = h_proj[..., 2 * H:]
    n = jnp.tanh(x_proj[..., 2 * H:] + r * hn)
    acts = jnp.concatenate([r, z, n], axis=-1)

    dgx, dgh, dh0 = _gru_run_bwd(
        acts, hn, ys_prev, dys.astype(jnp.float32),
        jnp.swapaxes(w_hh_t, 0, 1), dhT.astype(jnp.float32))

    # weight/bias grads reduce OUTSIDE as one big matmul over all steps
    dwhh_t = jax.lax.dot_general(
        ys_prev.reshape(B * T, H), dgh.reshape(B * T, H3),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbhh = jnp.sum(dgh, axis=(0, 1))
    return (dgx, dwhh_t.astype(w_hh_t.dtype), dbhh.astype(b_hh.dtype), dh0)


gru_recurrence_pallas.defvjp(_gru_vjp_fwd, _gru_vjp_bwd)


def gru_recurrence_pallas_sharded(mesh, x_proj, w_hh_t, b_hh, h0,
                                  batch_axis='dp'):
    """Batch-sharded GRU recurrence under shard_map (see the LSTM twin)."""
    from jax.sharding import PartitionSpec as P

    fn = _shard_map(
        lambda xp, w, b, h: gru_recurrence_pallas(xp, w, b, h),
        mesh=mesh,
        in_specs=(P(batch_axis, None, None), P(None, None), P(None),
                  P(batch_axis, None)),
        out_specs=(P(batch_axis, None, None), P(batch_axis, None)))
    return fn(x_proj, w_hh_t, b_hh, h0)


def gru_layer_pallas(params, xs, state, recurrent_dtype=None, mesh=None,
                     batch_axis='dp'):
    """Drop-in for rnn_ops.gru_layer backed by the Pallas recurrence —
    full training support via gru_recurrence_pallas' custom VJP (the
    reference's first-class enc_type=GRU path, rnnt/models.py:77-116).
    mesh: as lstm_layer_pallas — per-shard kernel under shard_map."""
    if recurrent_dtype is None:
        recurrent_dtype = (jnp.bfloat16 if jax.default_backend() == 'tpu'
                           else jnp.float32)
    h0 = state
    dtype = xs.dtype
    w_ih = params['w_ih'].astype(dtype)
    b_ih = params['b_ih'].astype(jnp.float32)
    x_proj = jax.lax.dot_general(
        xs, w_ih, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ih
    w_hh_t = jnp.swapaxes(params['w_hh'], 0, 1).astype(recurrent_dtype)
    b_hh = params['b_hh'].astype(jnp.float32)
    if mesh is not None and dict(mesh.shape).get(batch_axis, 1) > 1:
        ys, hT = gru_recurrence_pallas_sharded(
            mesh, x_proj, w_hh_t, b_hh, h0.astype(jnp.float32),
            batch_axis=batch_axis)
    else:
        ys, hT = gru_recurrence_pallas(x_proj, w_hh_t, b_hh,
                                       h0.astype(jnp.float32))
    return ys.astype(dtype), hT.astype(h0.dtype)


# ---------------------------------------------------------------------------
# multi-device wiring (proof + utility for mesh integration)
# ---------------------------------------------------------------------------

def lstm_recurrence_pallas_sharded(mesh, x_proj, w_hh_t, h0, c0,
                                   batch_axis='dp'):
    """Batch-sharded wrapper: runs the Pallas recurrence per-shard under
    shard_map (weights replicated, batch split over `batch_axis`).  The
    trainer activates rnn_ops.mesh_context so lstm_layer routes here on dp
    meshes (reference cuDNN-LSTM-under-DataParallel role, rnnt/models.py:64
    + cli/baseline.py:158-159)."""
    from jax.sharding import PartitionSpec as P

    fn = _shard_map(
        lambda xp, w, h, c: lstm_recurrence_pallas(xp, w, h, c),
        mesh=mesh,
        in_specs=(P(batch_axis, None, None), P(None, None),
                  P(batch_axis, None), P(batch_axis, None)),
        out_specs=(P(batch_axis, None, None), P(batch_axis, None),
                   P(batch_axis, None)))
    return fn(x_proj, w_hh_t, h0, c0)


def _shard_map(f, *, mesh, in_specs, out_specs):
    """shard_map with replication checking off, across jax versions
    (check_rep was renamed check_vma in jax 0.8's jax.shard_map)."""
    try:
        from jax import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
