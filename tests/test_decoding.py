"""Greedy decode: lax.scan implementation vs explicit Python-loop oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.models import transducer as T
from edgedict_tpu.models.decoding import (
    ctc_greedy_decode_postprocess, greedy_decode_from_encoder,
    transducer_greedy_decode, truncate_and_strip)

CFG = T.TransducerConfig(
    vocab_size=12, vocab_embed_size=8, input_size=16,
    enc_hidden_size=24, enc_layers=2, enc_proj_size=20,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=20,
    joint_size=24, enc_time_reductions=(1,))


def _oracle_greedy(params, cfg, h_enc):
    """Reference semantics re-executed as a plain Python loop (the torch loop
    at rnnt/models.py:249-263, re-expressed on our functional model)."""
    B, Tn, _ = h_enc.shape
    empty = jnp.zeros((B, 0), jnp.int32)
    h_dec, state = T.decoder_apply(params['decoder'], cfg, empty)
    h_dec = np.array(h_dec[:, 0])
    h, c = np.array(state[0]), np.array(state[1])
    preds = []
    for i in range(Tn):
        logits = T.joint_apply(params['joint'], h_enc[:, i],
                               jnp.asarray(h_dec))
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        pred = logp.argmax(axis=-1)
        preds.append(pred)
        h_dec_new, (h_new, c_new) = T.decoder_apply(
            params['decoder'], cfg, jnp.asarray(pred[:, None], jnp.int32),
            (jnp.asarray(h), jnp.asarray(c)))
        adv = pred != cfg.blank
        h_dec[adv] = np.asarray(h_dec_new)[adv, 0]
        h[:, adv] = np.asarray(h_new)[:, adv]
        c[:, adv] = np.asarray(c_new)[:, adv]
    return np.stack(preds, axis=1)


def test_greedy_matches_oracle():
    key = jax.random.PRNGKey(0)
    params = T.transducer_init(key, CFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(1), (3, 12, 20))
    y_scan, _ = greedy_decode_from_encoder(params, CFG, h_enc)
    y_oracle = _oracle_greedy(params, CFG, h_enc)
    np.testing.assert_array_equal(np.asarray(y_scan), y_oracle)


def test_greedy_end_to_end_jit():
    params = T.transducer_init(jax.random.PRNGKey(2), CFG)
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, 20, 16))
    xlen = jnp.asarray([20, 14])
    fn = jax.jit(lambda p, x, l: transducer_greedy_decode(p, CFG, x, l))
    y, out_len, neg_logp = fn(params, xs, xlen)
    assert y.shape == (2, 10)            # time reduction x2
    assert list(np.asarray(out_len)) == [10, 7]
    assert np.isfinite(np.asarray(neg_logp)).all()
    outs = truncate_and_strip(y, out_len, blank=CFG.blank)
    assert len(outs) == 2
    for o, n in zip(outs, [10, 7]):
        assert len(o) <= n and (o != CFG.blank).all()


def test_ctc_postprocess_collapse():
    y = np.asarray([[0, 1, 1, 0, 2, 2, 2, 3]])
    lp = np.zeros_like(y, dtype=np.float32)
    seqs, neg = ctc_greedy_decode_postprocess(y, lp, np.asarray([8]))
    np.testing.assert_array_equal(seqs[0], [1, 2, 3])
    # truncation respected
    seqs, _ = ctc_greedy_decode_postprocess(y, lp, np.asarray([4]))
    np.testing.assert_array_equal(seqs[0], [1])
