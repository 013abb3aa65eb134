"""Int8 weight-only quantized serving for the encoder.

Symmetric per-output-channel int8 weights with in-kernel
dequantization, halving the serving weight footprint and HBM working
set (E6D2 encoder: 54 MB bf16 → 27 MB).  Measured on chip
(scripts/verify_quant_tpu.py, VALIDATION.md §3e): ACCURACY-CLEAN —
token-exact vs fp32 serving on the synthetic stream where plain bf16
flipped a near-tie — and LATENCY-NEUTRAL (0.95×): the per-chunk device
step at B=1 is bounded by the per-layer kernel/serial-recurrence floor
(~15 µs/layer at 13-20 µs kernel times), not by weight DMA
(~10 µs/layer bf16), so reading half the bytes buys capacity, not
speed, on a v5e.  Deploy it for what it buys: 2× the models or stream
state per chip of HBM, equal tokens, equal latency.

Scope and precision policy (matches stream.prepare_inference_params):
  * ENCODER ONLY.  The prediction net and joint stay fp32 — the
    frame-synchronous token loop keeps its dtype-exact argmax guarantee;
    the encoder carries ~100 MB of the ~109 MB serving weights, so it is
    where the bytes are.
  * Weight-only: activations stay in the serving compute dtype
    (bf16/f32); there is no activation quantization and no calibration
    step — scales come from the weights alone (symmetric absmax/127 per
    output channel), so quantization is a pure parameter transform done
    once at decoder construction.
  * Matmul kernels keep the int8 values EXACT through the MXU (int8
    round-trips bf16 losslessly: |q| ≤ 127 < 256) and apply the fp32
    per-channel scale to the fp32 accumulator AFTER the matmul — the
    quantized matmul adds NO rounding beyond the quantizer itself,
    which is why int8 tokens track fp32 more closely than bf16's
    rounded weights do; the recurrence kernel dequantizes W_hh once
    into a VMEM scratch at t==0 (the weight is revisited every
    timestep — per-step dequantization would cost 4M VPU ops per
    frame).
  * Inference-only.  No VJP; training always runs bf16/fp32.

The reference serves quantizable models through OpenVINO
(/root/reference/rnnt/stream.py:123-223, cli/export_onnx.py), whose
post-training int8 path is the analogous production story; here the
quantized path is native to the same jitted chunk step as fp32/bf16
serving, selected per-decoder with `quantize='int8'`.

Routing: `stream.prepare_inference_params(..., quantize='int8')`
rewrites the encoder subtree to quantized leaves ('w_hh_q'/'w_hh_scale',
'w_ih_q'/'w_ih_scale', proj 'w_q'/'scale'); `ops/rnn.py:lstm_layer_tm`
and `ops/layers.py:linear` detect those leaves and dispatch here.  Off
TPU (unless EDGEDICT_QUANT_KERNELS=force puts the kernels in interpret
mode), under an active >1-shard mesh context, or on odd geometry, the
math falls back to dequantize-then-delegate into the normal unquantized
route — same numerics class, no kernel requirements.  Both encoder cell
types are covered: LSTM (4H gates) and GRU (3H gates, torch r/z/n
semantics with b_hh inside the reset gate).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edgedict_tpu.ops import rnn as rnn_ops
from edgedict_tpu.ops.rnn_pallas import (
    _block_len, _compiler_params, _interpret, _lstm_cell, _pad_t)


def _mode():
    # '0' = fallback math only, 'force' = kernels even off-TPU
    # (interpret mode, for CPU test coverage), else auto (TPU only)
    return os.environ.get('EDGEDICT_QUANT_KERNELS', '1')


def _kernels_on():
    mode = _mode()
    if mode == '0':
        return False
    if mode == 'force':
        return True
    return jax.default_backend() == 'tpu'


# ---------------------------------------------------------------------------
# quantization (host-side, once per decoder construction)
# ---------------------------------------------------------------------------

def quantize_int8(w):
    """w (K, N) float → (q (K, N) int8, scale (1, N) fp32): symmetric
    per-output-channel absmax scaling, q = round(w / scale) ∈ [-127, 127].
    Columns are output channels; all-zero columns get scale 1."""
    w = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _pad_rows_to(x, mult):
    pad = -x.shape[0] % mult
    if not pad:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def quantize_encoder(enc):
    """Rewrite a prepared encoder param subtree to int8 leaves.

    Per layer: W_hh as (H, nH) int8 + per-column scale (n = 4 LSTM /
    3 GRU); W_ih transposed to kernel layout (in, nH), int8, rows
    zero-padded to the int8 sublane tile (32) — callers zero-pad the
    activations to match, and zero rows contribute nothing.  Biases and
    LayerNorms pass through in the serving dtype.  The final projection
    becomes {'w_q' (H, P) int8, 'scale' (1, P), 'b'} picked up by
    ops/layers.py:linear.  The fp/bf16 W_ih/W_hh/w_hh_t leaves are
    DROPPED — keeping them would defeat the purpose (the prepared tree
    is the per-dispatch HBM working set)."""
    layers = []
    for lp in enc['layers']:
        rnn = lp['rnn']
        w_hh_q, w_hh_scale = quantize_int8(jnp.swapaxes(rnn['w_hh'], 0, 1))
        w_ih_q, w_ih_scale = quantize_int8(jnp.swapaxes(rnn['w_ih'], 0, 1))
        layers.append({
            'rnn': {
                'w_hh_q': w_hh_q, 'w_hh_scale': w_hh_scale,
                'w_ih_q': _pad_rows_to(w_ih_q, 32),
                'w_ih_scale': w_ih_scale,
                'b_ih': rnn['b_ih'], 'b_hh': rnn['b_hh'],
            },
            'ln': lp['ln'],
        })
    proj_q, proj_scale = quantize_int8(jnp.swapaxes(enc['proj']['w'], 0, 1))
    return {
        'norm': enc['norm'],
        'layers': layers,
        'proj': {'w_q': _pad_rows_to(proj_q, 32), 'scale': proj_scale,
                 'b': enc['proj']['b']},
    }


# ---------------------------------------------------------------------------
# int8-weight matmul kernel (x_proj and the final projection)
# ---------------------------------------------------------------------------

def cast_passthrough(qenc, dtype):
    """Cast the quantized encoder's pass-through float leaves (biases,
    LayerNorms, pre-norm) to the serving dtype, leaving the int8 q leaves
    and the fp32 per-channel scales (the kernels multiply them into the
    fp32 accumulator) untouched — so the quantized VALUES are independent
    of the serving dtype (stream.py:prepare_inference_params)."""
    def rec(t):
        if isinstance(t, dict):
            return {k: (v if k.endswith('scale') else rec(v))
                    for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(rec(v) for v in t)
        x = jnp.asarray(t)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return t
    return rec(qenc)


def _mm_kernel(x_ref, wq_ref, s_ref, b_ref, o_ref):
    # int8 weights ride the MXU exactly (cast to the activation dtype is
    # lossless for |q| ≤ 127); the per-channel scale multiplies the fp32
    # accumulator, so quantization adds NO matmul rounding beyond the
    # unquantized path's
    y = jnp.dot(x_ref[:, :], wq_ref[:, :].astype(x_ref.dtype),
                preferred_element_type=jnp.float32)
    o_ref[:, :] = (y * s_ref[0:1, :] + b_ref[0:1, :]).astype(o_ref.dtype)


def _col_block(n):
    for nb in (512, 256, 128):
        if n % nb == 0:
            return nb
    return None


# above this many activation rows the weight read is amortized and the
# plain XLA dequantize-then-dot path is at least as good (offline/batched
# encoders); the kernel targets the small-dispatch streaming regime
_MAX_KERNEL_ROWS = 4096


def _quant_matmul(x2d, wq, scale, bias2d):
    """x2d (R, k_in) → (R, N) in x2d.dtype.  wq (Kp, N) int8 with
    Kp ≥ k_in (zero-padded rows); grid over N column blocks so each
    block's int8 weights stream HBM→VMEM through the Pallas pipeline."""
    r, k_in = x2d.shape
    kp, n = wq.shape
    nb = _col_block(n)
    sub = 16 if x2d.dtype == jnp.bfloat16 else 8
    x = x2d
    if k_in < kp:
        x = jnp.pad(x, ((0, 0), (0, kp - k_in)))
    rp = -(-r // sub) * sub
    x = _pad_rows_to(x, sub)
    out = pl.pallas_call(
        _mm_kernel,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((rp, kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, nb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rp, nb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n), x2d.dtype),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wq, scale, bias2d)
    return out[:r]


def _dequant_matmul_xla(x2d, wq, scale, bias2d):
    """Fallback: dequantize in XLA, dot in the activation dtype with fp32
    accumulation — the exact shape of the unquantized path's math."""
    w = (wq.astype(jnp.float32) * scale)[:x2d.shape[1]].astype(x2d.dtype)
    y = jax.lax.dot_general(x2d, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + bias2d).astype(x2d.dtype)


def _sharded_trace():
    """True when a >1-shard mesh context is active or the session is
    multi-device without one — pallas_call is not GSPMD-partitionable, so
    those traces take the XLA fallback (the recurrence additionally
    refuses because its sequential chain must run per shard)."""
    ctx = rnn_ops.current_mesh()
    if ctx is None:
        return jax.device_count() > 1
    return (ctx != rnn_ops._SHARD_LOCAL
            and rnn_ops.axis_size(ctx[0], ctx[1]) > 1)


_warned_sharded = False


def _warn_sharded_fallback():
    """One-time notice that int8 serving under a sharded mesh (or a
    multi-device session without one) routes through the XLA dequantize
    fallback: full-precision weight copies are materialized per dispatch,
    so the HBM-traffic/footprint win does NOT hold there (advisor round 4;
    the Pallas int8 kernels are single-shard — see _sharded_trace)."""
    global _warned_sharded
    if not _warned_sharded:
        _warned_sharded = True
        import warnings
        warnings.warn(
            "int8 serving under a sharded mesh / multi-device session uses "
            "the XLA dequantize fallback (tokens stay exact, but weights "
            "are dequantized to full precision per dispatch — the 'halved "
            "serving weight footprint' claim holds single-device only)",
            RuntimeWarning, stacklevel=3)


def _mm(x2d, wq, scale, bias2d):
    if (_kernels_on() and not _sharded_trace()
            and _col_block(wq.shape[1]) is not None
            and wq.shape[0] % 32 == 0
            and x2d.shape[0] <= _MAX_KERNEL_ROWS):
        return _quant_matmul(x2d, wq, scale, bias2d)
    if _sharded_trace():
        _warn_sharded_fallback()
    return _dequant_matmul_xla(x2d, wq, scale, bias2d)


def quant_linear(params, x):
    """Drop-in for ops/layers.py:linear on a quantized
    {'w_q' (K, N) int8, 'scale' (1, N), 'b' (N,)} projection."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    bias2d = params['b'].astype(jnp.float32)[None, :]
    y = _mm(x2d, params['w_q'], params['scale'], bias2d)
    return y.reshape(lead + (y.shape[-1],))


# ---------------------------------------------------------------------------
# int8-weight LSTM recurrence kernel
# ---------------------------------------------------------------------------

def _fwd_kernel_q(xp_ref, wq_ref, s_ref, h0_ref, c0_ref,
                  ys_ref, cs_ref, h_s, c_s, w_s, *, k):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:, :] = h0_ref[:, :]
        c_s[:, :] = c0_ref[:, :]
        # W_hh is revisited every timestep: dequantize ONCE into VMEM
        # scratch (fp32 scale, stored in the compute dtype) instead of
        # paying a 4M-element VPU dequant per step
        w_s[:, :] = (wq_ref[:, :].astype(jnp.float32)
                     * s_ref[0:1, :]).astype(w_s.dtype)

    h = h_s[:, :]
    c = c_s[:, :]
    for j in range(k):
        gates = xp_ref[j].astype(jnp.float32) + jnp.dot(
            h.astype(w_s.dtype), w_s[:, :],
            preferred_element_type=jnp.float32)
        h, c = _lstm_cell(gates, c)
        ys_ref[j] = h.astype(ys_ref.dtype)
        cs_ref[j] = c
    h_s[:, :] = h
    c_s[:, :] = c


def _run_fwd_q(x_proj, w_hh_q, w_hh_scale, h0, c0):
    """Mirror of ops/rnn_pallas.py:_run_fwd with int8 HBM-side weights:
    x_proj (T, B, 4H) in the compute dtype, w_hh_q (H, 4H) int8 — HALF
    the per-dispatch weight read of the bf16 kernel."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    k = _block_len(T)
    tp = -(-T // k) * k
    x_proj = _pad_t(x_proj, tp)
    ys, cs = pl.pallas_call(
        functools.partial(_fwd_kernel_q, k=k),
        grid=(tp // k,),
        in_specs=[
            pl.BlockSpec((k, B, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, B, H), x_proj.dtype),
            jax.ShapeDtypeStruct((tp, B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((H, H4), x_proj.dtype)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x_proj, w_hh_q, w_hh_scale, h0, c0)
    return ys, cs


# ---------------------------------------------------------------------------
# int8-weight GRU recurrence kernel (torch gate semantics r, z, n)
# ---------------------------------------------------------------------------

def _gru_fwd_kernel_q(xp_ref, wq_ref, s_ref, bhh_ref, h0_ref,
                      ys_ref, h_s, w_s, *, k):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:, :] = h0_ref[:, :]
        w_s[:, :] = (wq_ref[:, :].astype(jnp.float32)
                     * s_ref[0:1, :]).astype(w_s.dtype)

    h = h_s[:, :]
    hdim = h.shape[-1]
    for j in range(k):
        h_proj = jnp.dot(h.astype(w_s.dtype), w_s[:, :],
                         preferred_element_type=jnp.float32) + bhh_ref[0]
        xp = xp_ref[j].astype(jnp.float32)
        r = jax.nn.sigmoid(xp[:, :hdim] + h_proj[:, :hdim])
        z = jax.nn.sigmoid(xp[:, hdim:2 * hdim] + h_proj[:, hdim:2 * hdim])
        n = jnp.tanh(xp[:, 2 * hdim:] + r * h_proj[:, 2 * hdim:])
        h = (1.0 - z) * n + z * h
        ys_ref[j] = h.astype(ys_ref.dtype)
    h_s[:, :] = h


def _gru_run_fwd_q(x_proj, w_hh_q, w_hh_scale, b_hh, h0):
    """Mirror of ops/rnn_pallas.py:_gru_run_fwd with int8 HBM-side
    recurrence weights (x_proj carries b_ih only; b_hh joins h_proj per
    step inside the reset gate — torch GRU semantics)."""
    T, B, H3 = x_proj.shape
    H = H3 // 3
    k = _block_len(T)
    tp = -(-T // k) * k
    x_proj = _pad_t(x_proj, tp)
    ys = pl.pallas_call(
        functools.partial(_gru_fwd_kernel_q, k=k),
        grid=(tp // k,),
        in_specs=[
            pl.BlockSpec((k, B, H3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, B, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, B, H), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((H, H3), x_proj.dtype)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x_proj, w_hh_q, w_hh_scale, b_hh[None], h0)
    return ys


def gru_layer_tm_q(params, xs, state):
    """Quantized time-major GRU layer: xs (T, B, in) → (ys (T, B, H), hT);
    inference only.  Dispatched to by ops/rnn.py:gru_layer_tm on int8
    param leaves."""
    h0 = state
    dtype = xs.dtype
    t, b, in_size = xs.shape
    h = h0.shape[-1]
    if not _kernels_on() or _sharded_trace() or h % 128:
        if _sharded_trace():
            _warn_sharded_fallback()
        return rnn_ops.gru_layer_tm(
            _dequant_rnn_params(params, in_size), xs, state)

    bias2d = params['b_ih'].astype(jnp.float32)[None, :]
    x_proj = _mm(xs.reshape(t * b, in_size), params['w_ih_q'],
                 params['w_ih_scale'], bias2d).reshape(t, b, 3 * h)
    pad = -b % 8
    if pad:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    ys = _gru_run_fwd_q(x_proj, params['w_hh_q'], params['w_hh_scale'],
                        params['b_hh'].astype(jnp.float32),
                        h0.astype(jnp.float32))
    ys, hT = ys[:t], ys[t - 1]
    if pad:
        ys, hT = ys[:, :b], hT[:b]
    return ys.astype(dtype), hT.astype(state.dtype)


def _dequant_rnn_params(params, in_size):
    """Unquantized param dict for the delegate fallback (mesh-sharded
    serving, off-TPU without force, odd geometry): same math class as the
    bf16 route, weights dequantized per dispatch."""
    w_ih_t = params['w_ih_q'].astype(jnp.float32) * params['w_ih_scale']
    w_hh_t = params['w_hh_q'].astype(jnp.float32) * params['w_hh_scale']
    return {
        'w_ih': jnp.swapaxes(w_ih_t[:in_size], 0, 1),
        'w_hh': jnp.swapaxes(w_hh_t, 0, 1),
        'w_hh_t': w_hh_t,
        'b_ih': params['b_ih'], 'b_hh': params['b_hh'],
    }


def lstm_layer_tm_q(params, xs, state):
    """Quantized time-major LSTM layer: xs (T, B, in) → (ys (T, B, H),
    (hT, cT)); inference only (no VJP).  Dispatched to by
    ops/rnn.py:lstm_layer_tm when the params carry int8 leaves."""
    h0, c0 = state
    dtype = xs.dtype
    t, b, in_size = xs.shape
    h = h0.shape[-1]
    if not _kernels_on() or _sharded_trace() or h % 128:
        if _sharded_trace():
            _warn_sharded_fallback()
        return rnn_ops.lstm_layer_tm(
            _dequant_rnn_params(params, in_size), xs, state)

    bias2d = (params['b_ih'] + params['b_hh']).astype(jnp.float32)[None, :]
    x_proj = _mm(xs.reshape(t * b, in_size), params['w_ih_q'],
                 params['w_ih_scale'], bias2d).reshape(t, b, 4 * h)
    pad = -b % 8
    if pad:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad), (0, 0)))
    ys, cs = _run_fwd_q(x_proj, params['w_hh_q'], params['w_hh_scale'],
                        h0.astype(jnp.float32), c0.astype(jnp.float32))
    ys, hT, cT = ys[:t], ys[t - 1], cs[t - 1]
    if pad:
        ys, hT, cT = ys[:, :b], hT[:b], cT[:b]
    return ys.astype(dtype), (hT.astype(state[0].dtype),
                              cT.astype(state[1].dtype))
