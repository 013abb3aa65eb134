"""CTC encoder model (reference CTCEncoder, rnnt/models.py:272-310):
Encoder → Linear → log-softmax, greedy decode with consecutive-dedup and
blank removal.  The reference wired no trainer for it; here `ctc_loss`
(optax) makes it trainable out of the box as the alternate model.
"""

import dataclasses

import jax
import jax.numpy as jnp
import optax

from edgedict_tpu.models import transducer as T
from edgedict_tpu.models.decoding import ctc_greedy_decode_postprocess
from edgedict_tpu.ops.layers import linear, linear_init
from edgedict_tpu.tokenizer import NUL


@dataclasses.dataclass(frozen=True)
class CTCConfig:
    vocab_size: int
    input_size: int
    enc_hidden_size: int = 600
    enc_layers: int = 4
    enc_dropout: float = 0.0
    enc_proj_size: int = 600
    blank: int = NUL
    module_type: str = 'LSTM'

    @property
    def encoder_cfg(self):
        return T.TransducerConfig(
            vocab_size=self.vocab_size, input_size=self.input_size,
            enc_hidden_size=self.enc_hidden_size,
            enc_layers=self.enc_layers, enc_dropout=self.enc_dropout,
            enc_proj_size=self.enc_proj_size,
            enc_time_reductions=(1,), module_type=self.module_type)


def ctc_init(key, cfg: CTCConfig):
    k1, k2 = jax.random.split(key)
    return {
        'encoder': T.encoder_init(k1, cfg.encoder_cfg),
        'tovocab': linear_init(k2, cfg.enc_proj_size, cfg.vocab_size),
    }


def ctc_apply(params, cfg: CTCConfig, xs, deterministic=True, rng=None):
    """(B, T, F) → log-probs (B, T', V) and scaled lengths helper."""
    h, _ = T.encoder_apply(params['encoder'], cfg.encoder_cfg, xs,
                           deterministic=deterministic, rng=rng)
    logits = linear(params['tovocab'], h)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def ctc_loss(params, cfg: CTCConfig, xs, ys, xlen, ylen,
             deterministic=True, rng=None):
    """Mean CTC loss (optax.ctc_loss; blank must be 0, which NUL is)."""
    logp = ctc_apply(params, cfg, xs, deterministic=deterministic, rng=rng)
    xlen_s = T.scale_length(cfg.encoder_cfg, xlen, xs.shape[1],
                            logp.shape[1])
    t_ids = jnp.arange(logp.shape[1])[None, :]
    logit_pad = (t_ids >= xlen_s[:, None]).astype(jnp.float32)
    u_ids = jnp.arange(ys.shape[1])[None, :]
    label_pad = (u_ids >= ylen[:, None]).astype(jnp.float32)
    losses = optax.ctc_loss(logp, logit_pad, ys, label_pad,
                            blank_id=cfg.blank)
    return jnp.mean(losses)


def ctc_greedy_decode(params, cfg: CTCConfig, xs, xlen):
    """Greedy decode: host post-processing collapses repeats + blanks
    (reference rnnt/models.py:294-310)."""
    logp = ctc_apply(params, cfg, xs)
    xlen_s = T.scale_length(cfg.encoder_cfg, xlen, xs.shape[1],
                            logp.shape[1])
    best_lp = jnp.max(logp, axis=-1)
    y_seq = jnp.argmax(logp, axis=-1)
    return ctc_greedy_decode_postprocess(y_seq, best_lp, xlen_s,
                                         blank=cfg.blank)
