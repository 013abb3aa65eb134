"""End-to-end learning test: the full stack (featurizer → transducer →
lattice loss → optimizer → greedy decode) overfits a tiny tone-coded
'speech' corpus until it decodes the training utterances correctly.

This is the strongest offline correctness evidence available without a
speech corpus: if any piece (gradients, length scaling, masking, decode
semantics) were broken, the WER would not go to ~0.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edgedict_tpu import optim
from edgedict_tpu.features import FeatureConfig, FeaturePipeline
from edgedict_tpu.metrics import wer
from edgedict_tpu.models import transducer as T
from edgedict_tpu.models.decoding import (
    transducer_greedy_decode, truncate_and_strip)

SR = 16000
TONES = [400.0, 800.0, 1600.0, 3000.0]   # token id 4+i ↔ tone i


def _utterance(rng, token_seq, seg=0.12):
    """Each token becomes a `seg`-second tone burst."""
    audio = []
    for tok in token_seq:
        f = TONES[tok - 4]
        t = np.arange(int(SR * seg)) / SR
        audio.append(0.4 * np.sin(2 * np.pi * f * t)
                     + 0.01 * rng.randn(len(t)))
    return np.concatenate(audio).astype(np.float32)


@pytest.mark.graded
def test_overfit_tone_language():
    rng = np.random.RandomState(0)
    seqs = [[4, 5, 6, 7], [7, 6, 5, 4], [4, 6, 4, 6], [5, 7, 5, 7]]
    utts = [_utterance(rng, s) for s in seqs]
    max_len = max(len(u) for u in utts)

    feature_cfg = FeatureConfig(feature_type='logfbank', feature_size=16,
                                n_fft=256, win_length=256, hop_length=128,
                                downsample=2)
    pipeline = FeaturePipeline(feature_cfg)
    cfg = T.TransducerConfig(
        vocab_size=8, vocab_embed_size=8, input_size=feature_cfg.input_size,
        enc_hidden_size=48, enc_layers=2, enc_proj_size=32,
        dec_hidden_size=32, dec_layers=1, dec_proj_size=32,
        joint_size=32, enc_time_reductions=(1,))
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)

    audio = np.zeros((4, max_len), np.float32)
    for i, u in enumerate(utts):
        audio[i, :len(u)] = u
    alen = jnp.asarray([len(u) for u in utts], jnp.int32)
    ys = jnp.asarray(seqs, jnp.int32)
    ylen = jnp.full((4,), 4, jnp.int32)
    audio = jnp.asarray(audio)

    opt = optim.build_optimizer('adam', lr=3e-3, gradclip=5.0)
    opt_state = opt.init(params)

    def loss_fn(p):
        xs, xlen = pipeline(audio, alen, train=False)
        return T.transducer_loss(p, cfg, xs, ys, xlen, ylen)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        import optax
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(300):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])

    xs, xlen = pipeline(audio, alen, train=False)
    y_seq, out_len, _ = transducer_greedy_decode(params, cfg, xs, xlen)
    hyps = truncate_and_strip(y_seq, out_len, blank=cfg.blank)
    refs = [' '.join(map(str, s)) for s in seqs]
    got = [' '.join(map(str, h)) for h in hyps]
    assert wer(refs, got) <= 0.25, list(zip(refs, got))
