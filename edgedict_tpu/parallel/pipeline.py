"""Pipeline parallelism ('pp' mesh axis) for the transducer encoder.

The reference scales training only by replicating the whole model per GPU
(DataParallel / lightning DDP, /root/reference/cli/baseline.py:158-159,
/root/reference/cli/lightning.py:325-337).  On a TPU pod slice a deep
recurrent encoder admits one more axis: GPipe-style pipelining of the
encoder layer stack over devices, with microbatches streaming through
stages over ICI.  This module implements that axis the SPMD way:

  * The encoder splits into a PREAMBLE (input LayerNorm + every layer up to
    and including the last in-encoder time reduction — the part whose
    activation shapes differ layer to layer) and a uniform TAIL of
    residual+LayerNorm recurrence layers, all (H → H) at the reduced frame
    rate.  The preamble runs on stage 0; inside the step the tail layers
    are STACKED and laid out one stage per device.  Persistent weight
    memory: with pp>1, `param_sharding` shards every encoder recurrence
    weight's gate axis over 'pp', so each device durably holds 1/pp of
    the encoder (the same total as holding its stage's layers); the
    in-step restack to per-stage layout is one ICI all-to-all.
  * One `shard_map` over the ('dp', 'pp') axes runs the classic GPipe
    schedule as a `lax.scan` of M + pp - 1 ticks: stage 0 feeds microbatch
    t through the preamble, every stage applies its local tail slice, and
    `lax.ppermute` hands activations to the next stage over ICI.  The
    schedule is jit-traced once; reverse-mode AD through scan + ppermute
    yields the mirrored backward pipeline for free — no hand-written
    1F1B machinery.
  * After the pipeline, the (M, B, T', H) encoder outputs reshard over
    ('pp', 'dp') jointly, so the joint+loss — the FLOPs-dominant phase —
    runs data-parallel across ALL devices (pipeline devices do not idle
    through the lattice loss).

Use `make_train_step_pp` for a full train step over a mesh built by
`make_mesh(dp=…, pp=…)`; bit-parity with the plain dp step is pinned in
tests/test_pipeline.py.  v1 limitation: in-encoder dropout is not
pipelined (the bundled presets train with enc_dropout=0; a nonzero value
raises rather than silently differing).

Expected overhead (analytic — single-chip rounds cannot measure it):
the GPipe schedule runs M + pp - 1 ticks for M microbatches, so the
pipeline-phase bubble fraction is (pp - 1) / (M + pp - 1) in each of
forward and backward — e.g. pp=4, M=8 → 27% of the ENCODER phase idle,
pp=4, M=32 → 8.6%.  The joint+loss phase (the FLOPs-dominant ~60% of
the E6D2 step, VALIDATION.md §3c) resharding over ('pp','dp') means the
bubble applies only to the encoder share, so the step-level overhead is
roughly 0.4 · (pp-1)/(M+pp-1) plus two ICI reshards of the (M,B,T',H)
activations.  A multi-chip round should verify: (a) measured step time ≈
dp-only time · (1 + that bound); (b) raising M amortizes the bubble at
the cost of smaller per-tick matmuls (microbatch B/M must stay ≥ the
MXU-saturating batch, ~32/stage per §3c's ladder); (c) the restack
all-to-all and ppermute hops ride ICI, not DCN (profile: no host
transfers inside the scan).
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from edgedict_tpu.models import transducer as T
from edgedict_tpu.ops import rnn as rnn_ops
from edgedict_tpu.ops.layers import layer_norm, linear
from edgedict_tpu.parallel.train import (
    TrainState, _set_lr, optax_apply_updates, optax_global_norm)


def _shard_map(f, *, mesh, in_specs, out_specs):
    """shard_map with replication checking off, across jax versions
    (the schedule branches on axis_index, which the rep checker rejects)."""
    try:
        from jax import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def pipeline_split(cfg, pp):
    """(k0, n_tail): preamble layer count and pipelined tail layer count.

    The preamble absorbs every in-encoder time reduction so the activations
    exchanged between stages all share one static (T', B, H) shape."""
    k0 = (max(cfg.enc_time_reductions) + 1) if cfg.enc_time_reductions else 1
    k0 = max(k0, 1)
    n_tail = cfg.enc_layers - k0
    if pp < 1:
        raise ValueError(f'pp={pp} must be >= 1')
    if n_tail < pp or n_tail % pp:
        raise ValueError(
            f'pipeline needs the {n_tail} uniform encoder layers after the '
            f'last time reduction (layer {k0 - 1}) to divide over pp={pp} '
            f'stages; enc_layers={cfg.enc_layers}, '
            f'enc_time_reductions={cfg.enc_time_reductions}')
    return k0, n_tail


def _reduced_t(cfg, t):
    for _ in cfg.enc_time_reductions:
        t = -(-t // cfg.reduction_factor)
    return t


def encoder_pipeline(params, cfg, micros, mesh, dp_axis='dp', pp_axis='pp'):
    """Pipelined encoder forward over M microbatches.

    Args:
      params: encoder params (models/transducer.py:encoder_init layout).
      cfg: TransducerConfig.
      micros: (M, B, T, input_size) — M microbatches, batch sharded over
        `dp_axis`, replicated over `pp_axis`.
      mesh: jax Mesh carrying both axes.
    Returns:
      (M, B, T', enc_proj_size) encoder outputs (semantics identical to
      encoder_apply per microbatch from zero state).
    """
    M, B, t_in, _ = micros.shape
    pp = dict(mesh.shape)[pp_axis]
    k0, n_tail = pipeline_split(cfg, pp)
    per_stage = n_tail // pp
    is_lstm = cfg.module_type == 'LSTM'
    H = cfg.enc_hidden_size
    t_out = _reduced_t(cfg, t_in)

    pre_p = {'norm': params['norm'], 'layers': list(params['layers'][:k0])}
    tail_p = jax.tree.map(lambda *xs: jnp.stack(xs), *params['layers'][k0:])

    def cell(layer, x):
        z = jnp.zeros((x.shape[1], H), jnp.float32)
        if is_lstm:
            ys, _ = rnn_ops.lstm_layer_tm(layer, x, (z, z))
        else:
            ys, _ = rnn_ops.gru_layer_tm(layer, x, z)
        return ys

    def body(pre, tail, mic):
        # mic: (M, T, B_local, F) time-major per-shard microbatches
        with rnn_ops.shard_local_context():
            return _body_inner(pre, tail, mic)

    def _body_inner(pre, tail, mic):
        stage = jax.lax.axis_index(pp_axis)
        b_loc = mic.shape[2]

        def run_preamble(x):
            x = layer_norm(pre['norm'], x)
            for i, layer in enumerate(pre['layers']):
                ys = cell(layer['rnn'], x)
                x = x + ys if i != 0 else ys
                x = layer_norm(layer['ln'], x)
                if i in cfg.enc_time_reductions:
                    x = T.time_reduction_tm(x, cfg.reduction_factor)
            return x

        def run_stage(x):
            for j in range(per_stage):
                layer = jax.tree.map(lambda a: a[j], tail)
                ys = cell(layer['rnn'], x)
                x = layer_norm(layer['ln'], x + ys)
            return x

        steps = M + pp - 1

        def tick(carry, t):
            recv, outbuf = carry
            mic_t = jax.lax.dynamic_index_in_dim(
                mic, jnp.minimum(t, M - 1), axis=0, keepdims=False)
            x_in = jax.lax.cond(stage == 0,
                                lambda: run_preamble(mic_t),
                                lambda: recv)
            y = run_stage(x_in)
            out_idx = jnp.clip(t - (pp - 1), 0, M - 1)
            outbuf = jax.lax.cond(
                t >= pp - 1,
                lambda ob: jax.lax.dynamic_update_index_in_dim(
                    ob, y, out_idx, 0),
                lambda ob: ob, outbuf)
            if pp > 1:
                y = jax.lax.ppermute(
                    y, pp_axis, [(i, i + 1) for i in range(pp - 1)])
            return (y, outbuf), None

        recv0 = jnp.zeros((t_out, b_loc, H), mic.dtype)
        outbuf0 = jnp.zeros((M, t_out, b_loc, H), mic.dtype)
        (_, outbuf), _ = jax.lax.scan(tick, (recv0, outbuf0),
                                      jnp.arange(steps))
        return outbuf

    fn = _shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(pp_axis), P(None, None, dp_axis, None)),
        out_specs=P(pp_axis, None, dp_axis, None))

    micros_tm = jnp.swapaxes(micros, 1, 2)        # (M, T, B, F)
    out = fn(pre_p, tail_p, micros_tm)            # (pp*M, T', B, H)
    out = jax.lax.slice_in_dim(out, (pp - 1) * M, pp * M, axis=0)
    out = linear(params['proj'], out)             # (M, T', B, P)
    return jnp.swapaxes(out, 1, 2)                # (M, B, T', P)


def make_train_step_pp(cfg, optimizer, mesh, bf16=True,
                       feature_pipeline=None):
    """Full sharded train step with a pipelined encoder.

    batch: {'xs': (M, micro_B, T, F), 'xlen'/'ys'/'ylen': (M, micro_B, …)}
    — or, with `feature_pipeline`, {'audio': (M, micro_B, L), 'alen': …}
    featurized on device per microbatch exactly like the plain step.  The
    gradient-accumulation microbatch axis M doubles as the pipeline
    microbatch axis (M % pp == 0 so the joint/loss phase can reshard
    (M·B) over ('pp', 'dp') and keep every device busy).

    Semantics match parallel.train.make_train_step with accum_steps=M
    (loss = mean over all M·B utterances; fp32 grad accumulation happens
    inside one value_and_grad instead of a scan) — pinned by
    tests/test_pipeline.py::test_train_step_pp_matches_plain.
    """
    if cfg.enc_dropout > 0 or cfg.dec_dropout > 0:
        raise NotImplementedError(
            'pipeline v1 does not thread dropout rngs through stages '
            '(the bundled presets train with dropout=0)')
    if dict(mesh.shape).get('tp', 1) > 1:
        raise NotImplementedError(
            'tp>1 with pp>1 is not supported: the pipelined joint/loss '
            'phase is data-parallel over (pp, dp) and the pipeline '
            'shard_map does not partition over tp (use tp with the plain '
            'dp step, or pp with tp=1)')
    pp = dict(mesh.shape)['pp']
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32

    def loss_fn(params, batch, rng):
        if feature_pipeline is not None:
            m = batch['audio'].shape[0]
            # same per-micro rng tree as the plain step's accum scan
            rngs = jax.random.split(rng, m)

            def feat(mic_audio, mic_len, r):
                r_feat, _ = jax.random.split(r)
                return feature_pipeline(mic_audio, mic_len, rng=r_feat,
                                        train=True)

            xs, xlen_in = jax.vmap(feat)(batch['audio'], batch['alen'],
                                         rngs)
        else:
            xs, xlen_in = batch['xs'], batch['xlen']
        xs = xs.astype(compute_dtype)
        M, B = xs.shape[:2]
        h_enc = encoder_pipeline(params['encoder'], cfg, xs, mesh)
        t_out = h_enc.shape[2]
        flat = lambda a: a.reshape((M * B,) + a.shape[2:])
        h_enc = flat(h_enc)
        if M % pp == 0:
            # joint/loss phase: microbatch rows data-parallel over BOTH axes
            h_enc = jax.lax.with_sharding_constraint(
                h_enc, NamedSharding(mesh, P(('pp', 'dp'))))
        ys, xlen, ylen = flat(batch['ys']), flat(xlen_in), \
            flat(batch['ylen'])
        # h_dec stays fp32 exactly like the plain step's transducer_loss
        # (the joint g-projection runs in h_dec.dtype there too)
        h_dec, _ = T.decoder_apply(params['decoder'], cfg, ys)
        from edgedict_tpu.ops.rnnt_loss import rnnt_loss_from_joint
        xlen_s = T.scale_length(cfg, xlen, xs.shape[2], t_out)
        losses = rnnt_loss_from_joint(params['joint'], h_enc, h_dec, ys,
                                      xlen_s, ylen, blank=cfg.blank)
        return jnp.mean(losses)

    def train_step(state, batch, rng, lr):
        # rng feeds featurization (dither + SpecAugment) only; model
        # dropout is unsupported (checked above)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        opt_state = _set_lr(state.opt_state, lr)
        updates, new_opt_state = optimizer.update(grads, opt_state,
                                                  state.params)
        params = optax_apply_updates(state.params, updates)
        gnorm = optax_global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), params, state.params)
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old)
            if getattr(new, 'ndim', None) is not None else new,
            new_opt_state, opt_state)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=new_opt_state)
        return new_state, {'loss': loss, 'grad_norm': gnorm,
                           'skipped': (~ok).astype(jnp.float32)}

    micro_shard = NamedSharding(mesh, P(None, 'dp'))
    repl = NamedSharding(mesh, P())
    keys = (('audio', 'alen', 'ys', 'ylen') if feature_pipeline is not None
            else ('xs', 'xlen', 'ys', 'ylen'))
    jitted = jax.jit(
        train_step,
        in_shardings=(None, {k: micro_shard for k in keys}, repl, repl),
        donate_argnums=(0,))

    def fn(state, batch, rng, lr):
        # batch rows spread over BOTH axes in the joint/loss phase, so the
        # fused joint+core and the decoder's Pallas recurrence shard over
        # ('pp','dp'); the pipeline stages themselves run under
        # shard_local_context and issue direct per-shard kernels
        with rnn_ops.mesh_context(mesh, batch_axis=('pp', 'dp')):
            return jitted(state, batch, rng, lr)

    return fn
