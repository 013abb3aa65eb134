"""Recurrent cells as XLA-friendly `lax.scan` layers.

TPU-native replacement for the reference's cuDNN `nn.LSTM`/`nn.GRU` calls
(reference rnnt/models.py:46,91,145 via torch).  Design:

  * The input projection `x @ W_ih^T + b_ih` for the WHOLE sequence is one
    large batched matmul (B, T, 4H) that XLA tiles onto the MXU; the
    sequential `lax.scan` then only carries the small `h @ W_hh^T` recurrence.
  * Weight layout and gate order are PyTorch-compatible — LSTM gates (i, f, g,
    o), GRU gates (r, z, n) with b_ih/b_hh kept separate (torch's GRU applies
    b_hn inside the reset gate) — so reference checkpoints import unchanged.
  * Every layer has the state-carrying signature `(params, xs, state) →
    (ys, state)` from day one: training scans the full T, streaming scans a
    chunk and carries the state pytree across calls (SURVEY.md §7).

All recurrences accumulate in fp32 regardless of input dtype.
"""

import jax
import jax.numpy as jnp


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def lstm_init(key, input_size, hidden_size):
    """PyTorch-style init: U(-1/sqrt(H), 1/sqrt(H)) for all tensors."""
    k = 1.0 / jnp.sqrt(hidden_size)
    keys = jax.random.split(key, 4)
    return {
        'w_ih': _uniform(keys[0], (4 * hidden_size, input_size), k),
        'w_hh': _uniform(keys[1], (4 * hidden_size, hidden_size), k),
        'b_ih': _uniform(keys[2], (4 * hidden_size,), k),
        'b_hh': _uniform(keys[3], (4 * hidden_size,), k),
    }


def gru_init(key, input_size, hidden_size):
    k = 1.0 / jnp.sqrt(hidden_size)
    keys = jax.random.split(key, 4)
    return {
        'w_ih': _uniform(keys[0], (3 * hidden_size, input_size), k),
        'w_hh': _uniform(keys[1], (3 * hidden_size, hidden_size), k),
        'b_ih': _uniform(keys[2], (3 * hidden_size,), k),
        'b_hh': _uniform(keys[3], (3 * hidden_size,), k),
    }


import contextlib
import os

# Mesh context: the sharded trainer (parallel/train.py) activates this while
# tracing its jitted step so the recurrence can route through shard_map over
# the batch axis — pallas_call is not auto-partitionable under GSPMD, but a
# per-shard kernel under shard_map composes with any dp mesh.
_MESH_CTX = []


@contextlib.contextmanager
def mesh_context(mesh, batch_axis='dp'):
    """Make `mesh` visible to RNN layers traced inside this scope.
    batch_axis may be one mesh axis name or a tuple of axes (e.g.
    ('pp', 'dp') for the pipelined train step, where the joint/loss batch
    rows spread over both)."""
    _MESH_CTX.append((mesh, batch_axis))
    try:
        yield
    finally:
        _MESH_CTX.pop()


_SHARD_LOCAL = ('local', None)


@contextlib.contextmanager
def shard_local_context():
    """Mark that tracing happens INSIDE an explicit shard_map body: arrays
    are already per-shard, so eligible kernels issue direct pallas calls
    (never another shard_map — nesting is illegal) and the multi-device
    fallback check is skipped.  Used by the pipeline stages
    (parallel/pipeline.py) and the fused joint+core shard_map body."""
    _MESH_CTX.append(_SHARD_LOCAL)
    try:
        yield
    finally:
        _MESH_CTX.pop()


def current_mesh():
    """(mesh, batch_axis) from the innermost mesh_context, or None.
    Inside shard_local_context this returns ('local', None)."""
    return _MESH_CTX[-1] if _MESH_CTX else None


def axis_size(mesh, axis):
    """Total shard count over `axis` (a mesh axis name or tuple of them)."""
    shape = dict(mesh.shape)
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= shape.get(a, 1)
        return n
    return shape.get(axis, 1)


def _pallas_mode(env='EDGEDICT_PALLAS_LSTM'):
    # '0' = off, 'force' = on even off-TPU (interpret mode, for CPU-mesh
    # integration tests), anything else = auto (TPU only)
    return os.environ.get(env, '1')


def _pallas_eligible(xs, hidden, env='EDGEDICT_PALLAS_LSTM',
                     time_major=False):
    """The Pallas recurrence needs tile-aligned per-shard (B, H) and pays
    off for multi-step sequences; streaming B=1 and odd shapes use the
    scan.  Under an active mesh_context the batch eligibility is checked
    PER SHARD and the kernel runs under shard_map; a multi-device session
    without a mesh context falls back (the scan shards transparently)."""
    mode = _pallas_mode(env)
    if mode == '0':
        return False
    if mode != 'force' and jax.default_backend() != 'tpu':
        return False
    if time_major:
        t, b, _ = xs.shape
    else:
        b, t, _ = xs.shape
    ctx = current_mesh()
    if ctx == _SHARD_LOCAL:
        pass                 # already per-shard inside a shard_map body
    elif ctx is not None:
        mesh, axis = ctx
        shards = axis_size(mesh, axis)
        if b % shards:
            return False
        b //= shards
    elif jax.device_count() > 1:
        return False
    return b % 8 == 0 and hidden % 128 == 0 and t > 1


def _pallas_batch_pad(xs, hidden, env='EDGEDICT_PALLAS_LSTM',
                      time_major=False):
    """Rows of zero-padding that would make a batch-misaligned call
    Pallas-eligible, or 0 when padding doesn't apply.

    The streaming decoders run the encoder at B=1 (or a handful of
    streams): the scan fallback then re-reads W_hh from HBM every time
    step — at E6D2 that is ~1 GB of weight traffic per 600 ms block,
    virtually the whole decode wall time — while the Pallas recurrence
    keeps W_hh VMEM-resident across its time grid and reads it ONCE per
    layer call.  Padding the batch to the 8-sublane tile and slicing the
    result back is pure win: the wasted-row gate FLOPs are noise next to
    the removed weight streaming.  Only for un-meshed (single-device) or
    shard-local tracing — padding a global batch before shard_map would
    change its per-shard split."""
    mode = _pallas_mode(env)
    if mode == '0':
        return 0
    if mode != 'force' and jax.default_backend() != 'tpu':
        return 0
    if time_major:
        t, b, _ = xs.shape
    else:
        b, t, _ = xs.shape
    ctx = current_mesh()
    if ctx is not None and ctx != _SHARD_LOCAL:
        return 0
    if ctx is None and jax.device_count() > 1:
        return 0
    if hidden % 128 or t <= 1 or b % 8 == 0:
        return 0
    return -b % 8


def _pad_rows(x, pad, axis):
    shape = list(x.shape)
    shape[axis] = pad
    return jnp.concatenate([x, jnp.zeros(shape, x.dtype)], axis)


def lstm_layer(params, xs, state):
    """Single-layer LSTM over time, batch-major.

    Delegates to the time-major layer via two transposes (XLA fuses them
    into the surrounding matmuls; the Pallas kernels are time-major
    internally anyway).

    Args:
      params: dict from lstm_init.
      xs: (B, T, input_size).
      state: (h, c) each (B, H).
    Returns:
      ys: (B, T, H); new (h, c).
    """
    ys, st = lstm_layer_tm(params, jnp.swapaxes(xs, 0, 1), state)
    return jnp.swapaxes(ys, 0, 1), st


def _route_pallas(fn_name, params, xs, state):
    import edgedict_tpu.ops.rnn_pallas as rp
    fn = getattr(rp, fn_name)
    ctx = current_mesh()
    if ctx is not None and ctx != _SHARD_LOCAL \
            and axis_size(ctx[0], ctx[1]) > 1:
        return fn(params, xs, state, mesh=ctx[0], batch_axis=ctx[1])
    return fn(params, xs, state)


def lstm_layer_tm(params, xs, state):
    """Time-major single-layer LSTM: xs (T, B, in) → (ys (T, B, H),
    (h, c)).

    The encoder's internal layout (models/transducer.py): the Pallas
    recurrence kernels are time-major, so batch-major callers pay two
    ~200 MB HBM transposes per layer per direction that XLA cannot fuse
    into the custom call.  The scan fallback is naturally time-major too
    (lax.scan carries the leading axis) — this path has NO transposes.

    On TPU with tile-aligned shapes dispatches to the Pallas recurrence
    kernel (ops/rnn_pallas.py — measured 1.8× the scan on fwd+bwd at
    encoder scale), per-shard under shard_map when a mesh_context is
    active; otherwise the lax.scan path below.

    Params carrying int8 leaves ('w_hh_q' — built by
    stream.prepare_inference_params(quantize='int8')) dispatch to the
    weight-only-quantized serving kernels (ops/quant.py)."""
    h0, c0 = state
    if 'w_hh_q' in params:
        from edgedict_tpu.ops import quant
        return quant.lstm_layer_tm_q(params, xs, state)
    if _pallas_eligible(xs, h0.shape[-1], time_major=True):
        return _route_pallas('lstm_layer_tm', params, xs, state)
    pad = _pallas_batch_pad(xs, h0.shape[-1], time_major=True)
    if pad:
        b = xs.shape[1]
        ys, (h, c) = _route_pallas(
            'lstm_layer_tm', params, _pad_rows(xs, pad, 1),
            (_pad_rows(h0, pad, 0), _pad_rows(c0, pad, 0)))
        return ys[:, :b], (h[:b], c[:b])
    dtype = xs.dtype
    w_ih = params['w_ih'].astype(dtype)
    w_hh = params['w_hh'].astype(jnp.float32)
    bias = (params['b_ih'] + params['b_hh']).astype(jnp.float32)
    x_proj = jax.lax.dot_general(
        xs, w_ih, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, B, 4H)

    def step(carry, x_t):
        h, c = carry
        gates = x_t + bias + jnp.dot(h, w_hh.T,
                                     preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h, c), ys = jax.lax.scan(
        step, (h0.astype(jnp.float32), c0.astype(jnp.float32)), x_proj)
    return ys.astype(dtype), (h.astype(h0.dtype), c.astype(c0.dtype))


def gru_layer_tm(params, xs, state):
    """Time-major single-layer GRU: xs (T, B, in) → (ys (T, B, H), h).
    Int8 param leaves dispatch to the quantized serving path
    (ops/quant.py), as in lstm_layer_tm."""
    h0 = state
    if 'w_hh_q' in params:
        from edgedict_tpu.ops import quant
        return quant.gru_layer_tm_q(params, xs, state)
    if _pallas_eligible(xs, h0.shape[-1], env='EDGEDICT_PALLAS_GRU',
                        time_major=True):
        return _route_pallas('gru_layer_tm', params, xs, state)
    pad = _pallas_batch_pad(xs, h0.shape[-1], env='EDGEDICT_PALLAS_GRU',
                            time_major=True)
    if pad:
        b = xs.shape[1]
        ys, h = _route_pallas('gru_layer_tm', params,
                              _pad_rows(xs, pad, 1), _pad_rows(h0, pad, 0))
        return ys[:, :b], h[:b]
    dtype = xs.dtype
    w_ih = params['w_ih'].astype(dtype)
    w_hh = params['w_hh'].astype(jnp.float32)
    b_ih = params['b_ih'].astype(jnp.float32)
    b_hh = params['b_hh'].astype(jnp.float32)
    x_proj = jax.lax.dot_general(
        xs, w_ih, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ih  # (T, B, 3H)

    def step(h, x_t):
        h_proj = jnp.dot(h, w_hh.T,
                         preferred_element_type=jnp.float32) + b_hh
        xr, xz, xn = jnp.split(x_t, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h, ys = jax.lax.scan(step, h0.astype(jnp.float32), x_proj)
    return ys.astype(dtype), h.astype(h0.dtype)


def gru_layer(params, xs, state):
    """Single-layer GRU over time (torch gate semantics), batch-major.

    r = σ(W_ir x + b_ir + W_hr h + b_hr)
    z = σ(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r ⊙ (W_hn h + b_hn))
    h' = (1 − z) ⊙ n + z ⊙ h

    Args/returns as lstm_layer but state is h only: (B, H).  Delegates to
    the time-major layer (Pallas forward+backward via custom VJP on TPU;
    EDGEDICT_PALLAS_GRU=0|force overrides)."""
    ys, h = gru_layer_tm(params, jnp.swapaxes(xs, 0, 1), state)
    return jnp.swapaxes(ys, 0, 1), h


def stacked_lstm_init(key, input_size, hidden_size, num_layers):
    """Multi-layer LSTM (torch nn.LSTM(num_layers=L) equivalent)."""
    keys = jax.random.split(key, num_layers)
    layers = []
    for i in range(num_layers):
        layers.append(lstm_init(keys[i],
                                input_size if i == 0 else hidden_size,
                                hidden_size))
    return {'layers': layers}


def stacked_lstm(params, xs, state, dropout=0.0, rng=None):
    """Multi-layer LSTM.  state: (h, c) each (L, B, H).  Dropout between
    layers (not after the last), matching torch nn.LSTM."""
    hs, cs = state
    new_h, new_c = [], []
    n_layers = len(params['layers'])
    for i, layer in enumerate(params['layers']):
        xs, (h, c) = lstm_layer(layer, xs, (hs[i], cs[i]))
        new_h.append(h)
        new_c.append(c)
        if dropout > 0 and rng is not None and i < n_layers - 1:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, xs.shape)
            xs = jnp.where(keep, xs / (1.0 - dropout), 0.0).astype(xs.dtype)
    return xs, (jnp.stack(new_h), jnp.stack(new_c))


def lstm_zero_state(num_layers, batch, hidden, dtype=jnp.float32):
    shape = (num_layers, batch, hidden)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def gru_zero_state(num_layers, batch, hidden, dtype=jnp.float32):
    return jnp.zeros((num_layers, batch, hidden), dtype)
