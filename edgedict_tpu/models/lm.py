"""RNN language model (reference LMModel, models.py:224-261) + LM loss.

Embedding → multi-layer LSTM → Linear → log-softmax, with optional weight
tying (embedding == output projection).  Same state-carrying signature as
every other recurrent layer here, so the beam search can thread LM state
per hypothesis for shallow fusion.
"""

import dataclasses

import jax
import jax.numpy as jnp

from edgedict_tpu.ops import rnn as rnn_ops
from edgedict_tpu.ops.layers import (
    embedding, embedding_init, linear, linear_init)


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int
    embed_size: int = 256
    hidden_size: int = 512
    num_layers: int = 2
    dropout: float = 0.0
    tie_weights: bool = False


def lm_init(key, cfg: LMConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        'embed': embedding_init(k1, cfg.vocab_size, cfg.embed_size),
        'lstm': rnn_ops.stacked_lstm_init(k2, cfg.embed_size,
                                          cfg.hidden_size, cfg.num_layers),
    }
    if cfg.tie_weights:
        assert cfg.embed_size == cfg.hidden_size, \
            'tie_weights needs embed_size == hidden_size (models.py:239)'
        params['out_b'] = jnp.zeros((cfg.vocab_size,), jnp.float32)
    else:
        params['out'] = linear_init(k3, cfg.hidden_size, cfg.vocab_size)
    return params


def lm_zero_state(cfg: LMConfig, batch, dtype=jnp.float32):
    return rnn_ops.lstm_zero_state(cfg.num_layers, batch, cfg.hidden_size,
                                   dtype)


def lm_apply(params, cfg: LMConfig, ys, state=None, deterministic=True,
             rng=None):
    """ys (B, U) int ids → (log_probs (B, U, V), new_state)."""
    if state is None:
        state = lm_zero_state(cfg, ys.shape[0])
    emb = embedding(params['embed'], ys)
    out, state = rnn_ops.stacked_lstm(
        params['lstm'], emb, state,
        dropout=0.0 if deterministic else cfg.dropout, rng=rng)
    if cfg.tie_weights:
        logits = jax.lax.dot_general(
            out, params['embed']['table'].astype(out.dtype),
            (((out.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + params['out_b']
    else:
        logits = linear(params['out'], out)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), state


def lm_loss(params, cfg: LMConfig, ys, ylen, deterministic=True, rng=None):
    """Next-token NLL with id-0 ignored (reference cli/train_lm.py uses
    NLLLoss(ignore_index=0)).  Inputs ys (B, U); predicts ys[:, 1:] from
    ys[:, :-1]."""
    logp, _ = lm_apply(params, cfg, ys[:, :-1], deterministic=deterministic,
                       rng=rng)
    targets = ys[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    pos = jnp.arange(targets.shape[1])[None, :]
    valid = (pos < (ylen - 1)[:, None]) & (targets != 0)
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def load_lm_checkpoint(path):
    """Load an LM checkpoint written by cli.train_lm
    (logs/<name>/lm.ckpt — model params + {'lm_cfg': ...} in extra).
    Returns (params, LMConfig); template-free so callers don't need to
    know the LM geometry in advance."""
    import json

    from flax import serialization

    with open(path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    cfg = LMConfig(**json.loads(raw['extra'])['lm_cfg'])
    # msgpack alone leaves list nodes as index-keyed dicts — map the
    # restored state dict onto a template built from the recovered config
    template = lm_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        jnp.asarray, serialization.from_state_dict(template, raw['model']))
    return params, cfg
