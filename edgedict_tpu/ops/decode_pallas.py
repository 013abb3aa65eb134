"""Fused frame-synchronous greedy decode step as ONE Pallas kernel.

TPU-native replacement for the streaming greedy loop's per-frame op chain
(reference rnnt/stream.py:102-119; here stream.py:frame_loop).  The XLA
`lax.scan` path issues ~15 tiny ops per frame (joint add/tanh, a 640x2048
logit matmul, argmax, embedding gather, two LSTM cells, a projection and
the non-blank gating) — each a few MICROseconds of per-op sequencing on a
~5 MFLOP/frame problem, so block decode is dispatch-latency-bound, not
compute-bound (VALIDATION.md §3: ~1 ms per 16-frame block at E6D2 while
the encoder kernels account for <0.3 ms of it).  This kernel runs the
whole frame loop in one `pallas_call`: every weight the loop touches
(joint dec/out projections, embedding table, prediction-net LSTM stack,
output projection) is VMEM-resident across the T-frame `fori_loop`, and a
frame costs actual compute instead of op dispatch.

Scan-path compatibility contract: bit-compatible in interpret mode (the
block and per-chunk decoders are pinned equal to full-sequence decode)
and token-exact in fp32 on chip.  Every matmul accumulates fp32
(`preferred_element_type`), every cast happens exactly where
stream.py/ops/rnn.py casts (f/g to compute dtype before the tanh, logits
back to compute dtype before argmax, LSTM state fp32 with per-frame
round-trip to the carried state dtype, layer outputs to the input
dtype), the embedding is an exact one-hot row-select with the PAD row
pre-zeroed (torch padding_idx semantics, ops/layers.py:embedding), and
argmax resolves ties to the FIRST maximum like jnp.argmax.

On-chip parity envelope (scripts/verify_decode_tpu, measured): interpret
mode is bit-exact by construction; real-TPU fp32 is token-exact (matmul
accumulation-order drift ~1e-9 never flips an argmax); real-TPU bf16
arithmetic can flip rare near-ties — Mosaic and XLA tile the same
fp32-accumulated matmuls in different orders, and a ~1-ulp-of-bf16 logit
difference at a rounding boundary picks the other token, after which the
decoder state diverges for the rest of the stream (~2% of streamed
tokens, round 3).  PRODUCTION bf16 serving therefore never runs the
frame loop in bf16: prepare_inference_params keeps the joint/prediction
net fp32 (bf16 encoder only) so this kernel executes pure-fp32 frames —
token-exact on chip — and the bf16 envelope above applies only to
explicitly fully-cast parameter trees (measured, rate-bounded by the
verify harness rather than asserted equal).

Weights enter in right-multiply layout via `build_decode_cache`, attached
once at decoder construction (stream.py:prepare_inference_params) so no
per-dispatch transposes reach HBM.

Env EDGEDICT_PALLAS_DECODE: '1' auto (TPU only, default), '0' off,
'force' on anywhere (interpret off-TPU; CPU-mesh integration tests).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mode():
    return os.environ.get('EDGEDICT_PALLAS_DECODE', '1')


def _interpret():
    return jax.default_backend() != 'tpu'


_VMEM_LIMIT = 100 * 1024 * 1024


def build_decode_cache(params):
    """Kernel-layout views of the joint + prediction-net weights, computed
    once at decoder construction (never per dispatch, never checkpointed).

    Layout: every matrix transposed to right-multiply (x @ W), biases
    pre-cast to the fp32 the reference op sequence accumulates in, the
    LSTM per-layer bias pre-summed exactly like ops/rnn.py:lstm_layer_tm
    ((b_ih + b_hh) in param dtype, THEN cast), the embedding PAD row
    pre-zeroed (ops/layers.py:embedding does this per call)."""
    from edgedict_tpu.tokenizer import PAD

    joint, dec = params['joint'], params['decoder']
    layers = []
    for lp in dec['lstm']['layers']:
        layers.append({
            'w_ih_t': jnp.swapaxes(lp['w_ih'], 0, 1),
            'w_hh_t': jnp.swapaxes(lp['w_hh'], 0, 1),
            'bias': (lp['b_ih'] + lp['b_hh']).astype(jnp.float32)[None, :],
        })
    return {
        'w_dec_t': jnp.swapaxes(joint['w_dec'], 0, 1),
        'b_joint': joint['b'].astype(jnp.float32)[None, :],
        'w_out_t': jnp.swapaxes(joint['out']['w'], 0, 1),
        'b_out': joint['out']['b'].astype(jnp.float32)[None, :],
        'table': dec['embed']['table'].at[PAD].set(0.0),
        'layers': layers,
        'w_proj_t': jnp.swapaxes(dec['proj']['w'], 0, 1),
        'b_proj': dec['proj']['b'].astype(jnp.float32)[None, :],
    }


def _shapes_ok(cfg):
    # dec_hidden_size itself must be lane-aligned: the fused gate slices
    # land at multiples of H inside the (B, 4H) gates tile
    return (cfg.vocab_size % 128 == 0 and cfg.joint_size % 128 == 0
            and cfg.dec_proj_size % 128 == 0
            and cfg.dec_hidden_size % 128 == 0)


def _first_argmax(x):
    """(B, V) → (B, 1) int32 index of the FIRST maximum (jnp.argmax tie
    semantics, including NaN-wins: a row containing NaN resolves to its
    FIRST NaN — plain max gives NaN, x==m is false everywhere, and the
    min-reduce would emit the out-of-range sentinel V otherwise), as lane
    reductions (no 1-D iota: TPU needs >=2-D).

    Comparisons run in f32 regardless of input dtype: bf16→f32 is exact
    (same order, same ties, same NaNs → bit-identical index), and Mosaic
    rejects the bf16 form at V>=2048 — masks derived from bf16 compares
    carry (16,128)-packed layouts that can't relayout against the i32
    iota/where ops ("Invalid relayout ... vector<8x2048xi1>", found by
    the on-chip bisect; f32 compiles at every geometry)."""
    x = x.astype(jnp.float32)
    v = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    nan = jnp.isnan(x)
    m = jnp.max(x, axis=1, keepdims=True)
    idx_max = jnp.min(jnp.where(x == m, col, v), axis=1, keepdims=True)
    idx_nan = jnp.min(jnp.where(nan, col, v), axis=1, keepdims=True)
    return jnp.where(jnp.any(nan, axis=1, keepdims=True), idx_nan, idx_max)


def _kernel(f_ref, wdec_ref, bj_ref, wout_ref, bout_ref, tab_ref,
            *rest, n_layers, blank, unk, block, t_actual, emit_logp):
    layer_refs = rest[:3 * n_layers]
    (wproj_ref, bproj_ref, hdec0_ref, hs0_ref, cs0_ref,
     tok_ref) = rest[3 * n_layers:3 * n_layers + 6]
    rest = rest[3 * n_layers + 6:]
    prob_ref = rest[0] if emit_logp else None
    hdec_ref, hs_ref, cs_ref = rest[1 if emit_logp else 0:]

    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _init():
        hdec_ref[:] = hdec0_ref[:]
        hs_ref[:] = hs0_ref[:]
        cs_ref[:] = cs0_ref[:]

    vocab = wout_ref.shape[1]
    dtype = f_ref.dtype
    state_dtype = hs_ref.dtype

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def frame(t, _):
        h_dec = hdec_ref[:]                              # (B, D) dtype
        # joint: g from the carried prediction-net output, f precomputed
        g = (mm(h_dec, wdec_ref[:]) + bj_ref[:]).astype(dtype)
        h = jnp.tanh(f_ref[t] + g)                       # (B, J) dtype
        logits = (mm(h, wout_ref[:]) + bout_ref[:]).astype(dtype)
        pred = _first_argmax(logits)                     # (B, 1) int32
        if emit_logp:
            # max log-softmax = -log Σ exp(x − max): the per-frame best
            # log-prob the offline greedy reports (models/decoding.py)
            x32 = logits.astype(jnp.float32)
            m = jnp.max(x32, axis=1, keepdims=True)
            lse = jnp.log(jnp.sum(jnp.exp(x32 - m), axis=1, keepdims=True))
            prob_ref[t] = -lse[:, 0]
        if unk is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            masked = jnp.where(col == unk,
                               jnp.asarray(-jnp.inf, dtype), logits)
            pred = jnp.where(pred == unk, _first_argmax(masked), pred)

        # embedding: exact one-hot row select (PAD row pre-zeroed)
        colv = jax.lax.broadcasted_iota(
            jnp.int32, (pred.shape[0], vocab), 1)
        onehot = (colv == pred).astype(tab_ref.dtype)
        xs = mm(onehot, tab_ref[:]).astype(tab_ref.dtype)  # (B, emb)

        # prediction-net LSTM stack (ops/rnn.py:lstm_layer_tm scan math)
        new_h, new_c = [], []
        for li in range(n_layers):
            wih_ref, whh_ref, b_ref = layer_refs[3 * li:3 * li + 3]
            h_prev = hs_ref[li].astype(jnp.float32)
            c_prev = cs_ref[li].astype(jnp.float32)
            gates = mm(xs, wih_ref[:]) + b_ref[:] + mm(h_prev, whh_ref[:])
            hd = c_prev.shape[-1]
            i = jax.nn.sigmoid(gates[:, :hd])
            f = jax.nn.sigmoid(gates[:, hd:2 * hd])
            gg = jnp.tanh(gates[:, 2 * hd:3 * hd])
            o = jax.nn.sigmoid(gates[:, 3 * hd:])
            c = f * c_prev + i * gg
            hh = o * jnp.tanh(c)
            new_h.append(hh)
            new_c.append(c)
            xs = hh.astype(dtype)                        # layer output dtype

        h_dec_new = (mm(xs, wproj_ref[:]) + bproj_ref[:]).astype(dtype)

        adv = pred != blank                              # (B, 1)
        hdec_ref[:] = jnp.where(adv, h_dec_new, h_dec)
        for li in range(n_layers):
            hs_ref[li] = jnp.where(adv, new_h[li].astype(state_dtype),
                                   hs_ref[li])
            cs_ref[li] = jnp.where(adv, new_c[li].astype(state_dtype),
                                   cs_ref[li])
        tok_ref[t] = pred[:, 0]
        return 0

    # last block may be partial: pad frames are never executed, so the
    # carried decoder state is exact even when T % block != 0
    valid = jnp.minimum(block, t_actual - gi * block)
    jax.lax.fori_loop(0, valid, frame, 0)


def _decode_block(t):
    """Frames per grid step for the T-blocked offline decode: bounds the
    VMEM-resident f slab (block × B × J).  Env EDGEDICT_DECODE_BLOCK.
    When the grid is actually blocked (k < t) Mosaic requires the block's
    sublane dim divisible by 8 — round down (min 8) so an arbitrary env
    setting can't produce an uncompilable BlockSpec.  The sublane round-up
    is re-clamped to t so this function's own contract (frames per grid
    step, <= t) holds even at tiny t (env=5, t=6: 8 would exceed t; t=6
    degenerates to whole-T)."""
    k = int(os.environ.get('EDGEDICT_DECODE_BLOCK', '32'))
    k = max(1, min(k, t))
    if k < t:
        k = min(max(8, (k // 8) * 8), t)
    return k


def _call_kernel(cache, f, h_dec, hs, cs, blank, unk, emit_logp=False,
                 block=None):
    """f (T, B, J) compute dtype; h_dec (B, D); hs/cs (L, B, H).
    Returns (tokens (T, B) int32 [, frame log-probs (T, B) f32 when
    emit_logp], updated carries).  The grid walks T in `block`-frame
    slabs (whole-T when block is None) so unbounded offline decodes never
    outgrow VMEM; decoder state persists across grid steps in revisited
    output blocks."""
    n_layers = len(cache['layers'])
    t, b, j = f.shape
    d = cache['w_proj_t'].shape[1]
    l, _, hid = hs.shape

    k = t if block is None else min(block, t)
    f = _pad_t(f, k)
    nb = f.shape[0] // k

    ins = [f, cache['w_dec_t'], cache['b_joint'], cache['w_out_t'],
           cache['b_out'], cache['table']]
    for lp in cache['layers']:
        ins += [lp['w_ih_t'], lp['w_hh_t'], lp['bias']]
    ins += [cache['w_proj_t'], cache['b_proj'], h_dec, hs, cs]

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((k, b, j), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [whole] * (len(ins) - 1)

    out_shape = [jax.ShapeDtypeStruct((f.shape[0], b), jnp.int32)]
    out_specs = [pl.BlockSpec((k, b), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if emit_logp:
        out_shape.append(jax.ShapeDtypeStruct((f.shape[0], b), jnp.float32))
        out_specs.append(pl.BlockSpec((k, b), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    carry_shapes = [
        jax.ShapeDtypeStruct((b, d), h_dec.dtype),
        jax.ShapeDtypeStruct((l, b, hid), hs.dtype),
        jax.ShapeDtypeStruct((l, b, hid), cs.dtype),
    ]
    carry_specs = [
        pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((l, b, hid), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((l, b, hid), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel, n_layers=n_layers, blank=blank,
                               unk=unk, block=k, t_actual=t,
                               emit_logp=emit_logp)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=tuple(out_shape + carry_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs + carry_specs),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*ins)
    tokens = outs[0][:t]
    if emit_logp:
        return (tokens, outs[1][:t]) + outs[2:]
    return (tokens,) + outs[1:]


def _pad_t(x, k):
    t = x.shape[0]
    pad = -t % k
    if not pad:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _pad_rows(x, pad, axis):
    if not pad:
        return x
    from edgedict_tpu.ops import rnn as rnn_ops
    return rnn_ops._pad_rows(x, pad, axis)


_TPU_PROBE = []     # memoized: does the kernel actually compile on TPU?


def _tpu_kernel_works():
    """One-time eager compile-and-run probe on tiny shapes.  Mosaic
    lowering can only be validated on a real TPU backend; if it rejects
    the kernel (this code is developed against interpret mode), every
    decoder silently keeps the exact-math scan fallback instead of dying
    inside a jitted serving step.

    The production entry points reach this at TRACE time (the routes are
    called while the chunk/eval step is being jitted), so the probe must
    not touch the ambient trace: simply invoking the kernel here would
    stage it into the outer graph as dead code — never compiled, never
    raising — and memoize a spurious ok=True.  Instead the probe is
    COMPILE-ONLY: numpy constants (concrete under any trace) through an
    independent `jax.jit(...).lower().compile()`, where Mosaic rejection
    surfaces.  Both serving dtypes and both lowerings (whole-T streaming;
    T-blocked + frame log-probs offline) are exercised."""
    import numpy as np

    if _TPU_PROBE:
        return _TPU_PROBE[0]

    def probe(dtype):
        z = lambda *s: np.zeros(s, dtype)
        f32 = lambda *s: np.zeros(s, np.float32)
        # vocab kept at the PRODUCTION 2048: Mosaic rejections are shape-
        # dependent (the bf16 argmax mask-relayout failure only appears at
        # V>=2048 — a V=128 probe memoized a spurious ok=True in round 3)
        cache = {
            'w_dec_t': z(128, 128),
            'b_joint': f32(1, 128),
            'w_out_t': z(128, 2048),
            'b_out': f32(1, 2048),
            'table': z(2048, 8),
            'layers': [{'w_ih_t': z(8, 512),
                        'w_hh_t': z(128, 512),
                        'bias': f32(1, 512)}],
            'w_proj_t': z(128, 128),
            'b_proj': f32(1, 128),
        }
        jax.jit(lambda: _call_kernel(
            cache, z(2, 8, 128), z(8, 128), z(1, 8, 128), z(1, 8, 128),
            0, 3)).lower().compile()
        # offline leg: block must satisfy Mosaic's sublane-divisibility
        # rule when k < T (k=8 here; a k=2 probe was itself the invalid
        # BlockSpec and memoized a spurious ok=False for rounds 2-3)
        jax.jit(lambda: _call_kernel(
            cache, z(17, 8, 128), z(8, 128), z(1, 8, 128), z(1, 8, 128),
            0, None, emit_logp=True, block=8)).lower().compile()

    try:
        probe(np.float32)
        probe(jnp.bfloat16)
        ok = True
    except Exception:
        ok = False
    _TPU_PROBE.append(ok)
    return ok


def _route_ok(cfg, mode):
    """Gate conditions shared by the streaming and offline entry points:
    env kill-switch, TPU-only unless forced, lane-aligned geometry, and
    the one-time Mosaic compile probe."""
    if mode == '0':
        return False
    if mode != 'force' and jax.default_backend() != 'tpu':
        return False
    if not _shapes_ok(cfg):
        return False
    if mode != 'force' and not _tpu_kernel_works():
        return False
    return True


def maybe_greedy_frame_loop(params, cfg, state, enc_xs, unk_id):
    """Drop-in for stream.py's scan frame loop: enc_xs (B, T, E) →
    (tokens (T, B) int32, h_dec, dec_state) — or None when the kernel
    does not apply (off-TPU without force, odd geometry, batch that
    doesn't divide the active mesh).  Routes through shard_map when
    traced under an active mesh_context (sharded server decode), pads
    stray batches to the 8-sublane tile otherwise."""
    from edgedict_tpu.ops import rnn as rnn_ops

    mode = _mode()
    if '_decode' not in params or not _route_ok(cfg, mode):
        return None
    cache = params['_decode']
    if enc_xs.dtype != jnp.asarray(cache['w_out_t']).dtype:
        # f32-prepared params driven with bf16 activations: the scan casts
        # each weight to the activation dtype per op, the kernel would
        # multiply in the cached dtype — decline rather than drift (the
        # offline route declines the same case)
        return None

    b = enc_xs.shape[0]
    ctx = rnn_ops.current_mesh()
    sharded = (ctx is not None and ctx != rnn_ops._SHARD_LOCAL
               and rnn_ops.axis_size(ctx[0], ctx[1]) > 1)
    if sharded:
        shards = rnn_ops.axis_size(ctx[0], ctx[1])
        if b % shards or (b // shards) % 8:
            return None
    elif ctx is None and jax.device_count() > 1 and mode != 'force':
        # unmeshed multi-device session: stay on the scan, which GSPMD
        # shards transparently (same policy as ops/rnn.py)
        return None

    dtype = enc_xs.dtype
    # f for ALL frames in one MXU matmul — same contraction (and same
    # fp32 accumulation + cast) as joint_project's per-frame f
    f = jax.lax.dot_general(
        enc_xs, params['joint']['w_enc'].astype(dtype),
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    f = jnp.swapaxes(f, 0, 1)                            # (T, B, J)
    h_dec, (hs, cs) = state.h_dec, state.dec_state
    blank, unk = int(cfg.blank), None if unk_id is None else int(unk_id)

    if sharded:
        from jax.sharding import PartitionSpec as P

        from edgedict_tpu.ops.rnn_pallas import _shard_map
        mesh, ax = ctx
        fn = _shard_map(
            lambda ca, ff, hd, h, c: _call_kernel(ca, ff, hd, h, c,
                                                  blank, unk),
            mesh=mesh,
            in_specs=(P(), P(None, ax, None), P(ax, None),
                      P(None, ax, None), P(None, ax, None)),
            out_specs=(P(None, ax), P(ax, None),
                       P(None, ax, None), P(None, ax, None)))
        tokens, h_dec, hs, cs = fn(cache, f, h_dec, hs, cs)
        return tokens, h_dec, (hs, cs)

    pad = -b % 8
    tokens, h_dec, hs, cs = _call_kernel(
        cache, _pad_rows(f, pad, 1), _pad_rows(h_dec, pad, 0),
        _pad_rows(hs, pad, 1), _pad_rows(cs, pad, 1), blank, unk)
    if pad:
        tokens, h_dec = tokens[:, :b], h_dec[:b]
        hs, cs = hs[:, :b], cs[:, :b]
    return tokens, h_dec, (hs, cs)


def maybe_greedy_decode(params, cfg, h_enc):
    """Offline batched greedy decode (models/decoding.py semantics:
    log-softmax max per frame, no <unk> suppression) through the fused
    kernel, T walked in VMEM-sized slabs: h_enc (B, T', E) →
    (y_seq (B, T') int32, neg_logp (B,) f32) — or None when the kernel
    does not apply.  Used by trainer eval and cli.wer_parity (batched
    whole-utterance decode), where T' is unbounded."""
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.ops import rnn as rnn_ops

    mode = _mode()
    if not _route_ok(cfg, mode):
        return None
    ctx = rnn_ops.current_mesh()
    if ctx is not None and ctx != rnn_ops._SHARD_LOCAL \
            and rnn_ops.axis_size(ctx[0], ctx[1]) > 1:
        return None            # sharded eval keeps the scan (GSPMD splits it)
    if ctx is None and jax.device_count() > 1 and mode != 'force':
        return None

    cache = params.get('_decode')
    if cache is None:
        cache = build_decode_cache(params)   # in-trace; amortized over T'
    if h_enc.dtype != jnp.asarray(cache['w_out_t']).dtype:
        # mixed-dtype joint promotes differently in the scan; stay exact
        return None

    b, t, _ = h_enc.shape
    dtype = h_enc.dtype
    # BOS priming, exactly like greedy_decode_from_encoder
    empty = jnp.zeros((b, 0), jnp.int32)
    h_dec0, (hs, cs) = T.decoder_apply(params['decoder'], cfg, empty)
    h_dec0 = h_dec0[:, 0].astype(dtype)
    f = jax.lax.dot_general(
        h_enc, params['joint']['w_enc'].astype(dtype),
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    f = jnp.swapaxes(f, 0, 1)                            # (T, B, J)

    pad = -b % 8
    tokens, probs, _, _, _ = _call_kernel(
        cache, _pad_rows(f, pad, 1), _pad_rows(h_dec0, pad, 0),
        _pad_rows(hs, pad, 1), _pad_rows(cs, pad, 1),
        int(cfg.blank), None, emit_logp=True, block=_decode_block(t))
    y_seq = jnp.swapaxes(tokens[:, :b], 0, 1)            # (B, T')
    neg_logp = -jnp.sum(probs[:, :b], axis=0)
    return y_seq, neg_logp
