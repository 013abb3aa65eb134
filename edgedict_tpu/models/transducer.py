"""RNN-Transducer model core: Encoder / Decoder (prediction net) / Joint.

Pure-functional rebuild of the reference model layer
(/root/reference/rnnt/models.py:16-269) with one params pytree + explicit RNN
state pytrees, so the SAME functions serve training (full-T scan), batched
eval, and chunked streaming with carried state — dissolving the reference's
train/stream/export triplication (SURVEY.md §7 design stance).

Semantics preserved from the reference:
  * TimeReduction mean-pools T by `reduction_factor`, padding T to divisible
    (rnnt/models.py:16-29)
  * ResLayerNormLSTM/GRU: N × (1-layer RNN → LayerNorm → optional
    TimeReduction → optional Dropout) with residual add from layer 2 on,
    state stacked on dim 0 (rnnt/models.py:32-116)
  * Encoder: input LayerNorm → stack → optional Linear proj
    (rnnt/models.py:119-136)
  * Decoder: Embedding(padding_idx=PAD) → multi-layer LSTM → Linear proj;
    prepends BOS when state is None (rnnt/models.py:139-157)
  * Joint: Linear → Tanh → Linear on broadcast enc/dec features
    (rnnt/models.py:160-179)

TPU-native deviation: the Joint's first Linear on the concatenated
[h_enc; h_dec] is algebraically split into two projections applied BEFORE
broadcasting (h_enc @ W_e + h_dec @ W_d + b), so the (B, T, U, 2H) concat
tensor is never materialized — only the (B, T, U, J) sum.  Identical math;
reference checkpoints import by splitting the first joint weight columnwise.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from edgedict_tpu.ops import rnn as rnn_ops
from edgedict_tpu.ops.layers import (
    dropout, embedding, embedding_init, layer_norm, layer_norm_init, linear,
    linear_init)
from edgedict_tpu.tokenizer import BOS, NUL, PAD


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int
    vocab_embed_size: int = 16
    input_size: int = 240
    enc_hidden_size: int = 600
    enc_layers: int = 4
    enc_dropout: float = 0.0
    enc_proj_size: int = 600
    dec_hidden_size: int = 150
    dec_layers: int = 2
    dec_dropout: float = 0.0
    dec_proj_size: int = 150
    joint_size: int = 512
    enc_time_reductions: Tuple[int, ...] = (1,)
    reduction_factor: int = 2
    blank: int = NUL
    module_type: str = 'LSTM'   # 'LSTM' | 'GRU'

    @property
    def time_scale(self):
        """Total time downscaling applied inside the encoder."""
        return self.reduction_factor ** len(self.enc_time_reductions)

    @classmethod
    def from_flags(cls, FLAGS, vocab_size, input_size):
        return cls(
            vocab_size=vocab_size,
            vocab_embed_size=FLAGS.vocab_embed_size,
            input_size=input_size,
            enc_hidden_size=FLAGS.enc_hidden_size,
            enc_layers=FLAGS.enc_layers,
            enc_dropout=FLAGS.enc_dropout,
            enc_proj_size=FLAGS.enc_proj_size,
            dec_hidden_size=FLAGS.dec_hidden_size,
            dec_layers=FLAGS.dec_layers,
            dec_dropout=FLAGS.dec_dropout,
            dec_proj_size=FLAGS.dec_proj_size,
            joint_size=FLAGS.joint_size,
            module_type=FLAGS.enc_type,
        )


# ---------------------------------------------------------------------------
# time reduction
# ---------------------------------------------------------------------------

def time_reduction(xs, factor):
    """Mean-pool the time axis by `factor`, padding T to divisible
    (reference rnnt/models.py:16-29 pads with zeros then means — padded
    frames average zeros in, exactly as the reference does)."""
    b, t, h = xs.shape
    pad = (-t) % factor
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    xs = xs.reshape(b, -1, factor, h)
    return jnp.mean(xs, axis=2)


def time_reduction_tm(xs, factor):
    """time_reduction for time-major (T, B, H) activations."""
    t, b, h = xs.shape
    pad = (-t) % factor
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))
    xs = xs.reshape(-1, factor, b, h)
    return jnp.mean(xs, axis=1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: TransducerConfig):
    keys = jax.random.split(key, cfg.enc_layers + 2)
    is_lstm = cfg.module_type == 'LSTM'
    cell_init = rnn_ops.lstm_init if is_lstm else rnn_ops.gru_init
    layers = []
    in_size = cfg.input_size
    for i in range(cfg.enc_layers):
        layers.append({
            'rnn': cell_init(keys[i], in_size, cfg.enc_hidden_size),
            'ln': layer_norm_init(cfg.enc_hidden_size),
        })
        in_size = cfg.enc_hidden_size
    return {
        'norm': layer_norm_init(cfg.input_size),
        'layers': layers,
        'proj': linear_init(keys[-1], cfg.enc_hidden_size, cfg.enc_proj_size),
    }


def encoder_zero_state(cfg: TransducerConfig, batch, dtype=jnp.float32):
    if cfg.module_type == 'LSTM':
        return rnn_ops.lstm_zero_state(cfg.enc_layers, batch,
                                       cfg.enc_hidden_size, dtype)
    return rnn_ops.gru_zero_state(cfg.enc_layers, batch,
                                  cfg.enc_hidden_size, dtype)


def encoder_apply(params, cfg: TransducerConfig, xs, state=None,
                  deterministic=True, rng=None):
    """xs: (B, T, input_size) → (B, T // time_scale, enc_proj_size).

    state: per-layer RNN state ((L,B,H),(L,B,H)) for LSTM, (L,B,H) for GRU;
    None means zeros.  Returns (ys, new_state).
    """
    is_lstm = cfg.module_type == 'LSTM'
    if state is None:
        state = encoder_zero_state(cfg, xs.shape[0])
    # Time-major internally: the recurrence kernels and the lax.scan
    # fallback both iterate the leading axis, so running the whole stack
    # (T, B, ·) removes two ~200 MB HBM transposes per layer per direction
    # that XLA cannot fuse into the Pallas custom calls (measured ~12 ms
    # of the E6D2/B=32 encoder fwd+bwd).  Only the small model inputs and
    # outputs transpose, once each.
    xs = jnp.swapaxes(xs, 0, 1)
    xs = layer_norm(params['norm'], xs)
    new_h, new_c = [], []
    for i, layer in enumerate(params['layers']):
        if is_lstm:
            hs, cs = state
            ys, (h, c) = rnn_ops.lstm_layer_tm(layer['rnn'], xs,
                                               (hs[i], cs[i]))
            new_c.append(c)
        else:
            ys, h = rnn_ops.gru_layer_tm(layer['rnn'], xs, state[i])
        new_h.append(h)
        # residual add from layer 2 on (reference rnnt/models.py:66-69)
        xs = xs + ys if i != 0 else ys
        xs = layer_norm(layer['ln'], xs)
        if i in cfg.enc_time_reductions:
            xs = time_reduction_tm(xs, cfg.reduction_factor)
        if not deterministic and cfg.enc_dropout > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            xs = dropout(sub, xs, cfg.enc_dropout, deterministic=False)
    xs = linear(params['proj'], xs)
    xs = jnp.swapaxes(xs, 0, 1)
    if is_lstm:
        new_state = (jnp.stack(new_h), jnp.stack(new_c))
    else:
        new_state = jnp.stack(new_h)
    return xs, new_state


# ---------------------------------------------------------------------------
# decoder (prediction network)
# ---------------------------------------------------------------------------

def decoder_init(key, cfg: TransducerConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        'embed': embedding_init(k1, cfg.vocab_size, cfg.vocab_embed_size,
                                padding_idx=PAD),
        'lstm': rnn_ops.stacked_lstm_init(k2, cfg.vocab_embed_size,
                                          cfg.dec_hidden_size,
                                          cfg.dec_layers),
        'proj': linear_init(k3, cfg.dec_hidden_size, cfg.dec_proj_size),
    }


def decoder_zero_state(cfg: TransducerConfig, batch, dtype=jnp.float32):
    return rnn_ops.lstm_zero_state(cfg.dec_layers, batch,
                                   cfg.dec_hidden_size, dtype)


def decoder_apply(params, cfg: TransducerConfig, ys, state=None,
                  deterministic=True, rng=None):
    """ys: (B, U) int token ids → (B, U(+1), dec_proj_size).

    When state is None a BOS is prepended (training / fresh decode), exactly
    like the reference (rnnt/models.py:150-152); with a state this is a
    streaming step on the given tokens.
    """
    if state is None:
        ys = jnp.pad(ys, ((0, 0), (1, 0)), constant_values=BOS)
        state = decoder_zero_state(cfg, ys.shape[0])
    emb = embedding(params['embed'], ys, padding_idx=PAD)
    out, state = rnn_ops.stacked_lstm(
        params['lstm'], emb, state,
        dropout=0.0 if deterministic else cfg.dec_dropout, rng=rng)
    out = linear(params['proj'], out)
    return out, state


# ---------------------------------------------------------------------------
# joint network
# ---------------------------------------------------------------------------

def joint_init(key, cfg: TransducerConfig):
    # equivalent init to torch Linear(enc_proj + dec_proj, joint_size)
    in_size = cfg.enc_proj_size + cfg.dec_proj_size
    k = 1.0 / jnp.sqrt(in_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -k, k)
    out = linear_init(k4, cfg.joint_size, cfg.vocab_size)
    return {
        'w_enc': u(k1, (cfg.joint_size, cfg.enc_proj_size)),
        'w_dec': u(k2, (cfg.joint_size, cfg.dec_proj_size)),
        'b': u(k3, (cfg.joint_size,)),
        'out': out,
    }


def joint_project(params, h_enc, h_dec):
    """Pre-broadcast projections: returns (f, g) with f = h_enc @ W_e^T,
    g = h_dec @ W_d^T + b, each (..., joint_size)."""
    dtype = h_enc.dtype
    f = jax.lax.dot_general(
        h_enc, params['w_enc'].astype(dtype),
        (((h_enc.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(
        h_dec, params['w_dec'].astype(dtype),
        (((h_dec.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = g + params['b'].astype(jnp.float32)
    return f.astype(dtype), g.astype(dtype)


def joint_apply(params, h_enc, h_dec):
    """Reference Joint.forward semantics (rnnt/models.py:169-179): with 3-D
    inputs (B,T,E)/(B,U,D) produce the full (B,T,U,V) lattice; with matching
    lower-rank inputs, a pointwise joint."""
    f, g = joint_project(params, h_enc, h_dec)
    if h_enc.ndim == 3 and h_dec.ndim == 3:
        h = f[:, :, None, :] + g[:, None, :, :]
    else:
        h = f + g
    h = jnp.tanh(h)
    return linear(params['out'], h)


# ---------------------------------------------------------------------------
# full transducer
# ---------------------------------------------------------------------------

def transducer_init(key, cfg: TransducerConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        'encoder': encoder_init(k1, cfg),
        'decoder': decoder_init(k2, cfg),
        'joint': joint_init(k3, cfg),
    }


def scale_length(cfg: TransducerConfig, xlen, t_in, t_out):
    """Rescale frame lengths after in-encoder time reduction (reference
    Transducer.scale_length, rnnt/models.py:223-226, computed with the padded
    T since shapes are static here)."""
    scale = jnp.ceil(jnp.asarray(t_in, jnp.float32) / t_out)
    return jnp.ceil(xlen.astype(jnp.float32) / scale).astype(jnp.int32)


def transducer_logits(params, cfg: TransducerConfig, xs, ys,
                      deterministic=True, rng=None):
    """Full-lattice logits (B, T', U+1, V) — the reference forward with
    output_loss=False (rnnt/models.py:228-241)."""
    if rng is not None:
        rng_e, rng_d = jax.random.split(rng)
    else:
        rng_e = rng_d = None
    h_enc, _ = encoder_apply(params['encoder'], cfg, xs,
                             deterministic=deterministic, rng=rng_e)
    h_dec, _ = decoder_apply(params['decoder'], cfg, ys,
                             deterministic=deterministic, rng=rng_d)
    return joint_apply(params['joint'], h_enc, h_dec)


def transducer_loss(params, cfg: TransducerConfig, xs, ys, xlen, ylen,
                    deterministic=True, rng=None):
    """Mean RNN-T loss over the batch (reference forward with output_loss=True
    → warp-transducer; here the native JAX lattice loss, SURVEY §2.3)."""
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss_from_joint
    if rng is not None:
        rng_e, rng_d = jax.random.split(rng)
    else:
        rng_e = rng_d = None
    h_enc, _ = encoder_apply(params['encoder'], cfg, xs,
                             deterministic=deterministic, rng=rng_e)
    h_dec, _ = decoder_apply(params['decoder'], cfg, ys,
                             deterministic=deterministic, rng=rng_d)
    xlen_s = scale_length(cfg, xlen, xs.shape[1], h_enc.shape[1])
    losses = rnnt_loss_from_joint(params['joint'], h_enc, h_dec, ys,
                                  xlen_s, ylen, blank=cfg.blank)
    return jnp.mean(losses)
