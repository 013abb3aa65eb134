"""Beam search: greedy equivalence at W=1, score ordering, LM fusion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edgedict_tpu.models import transducer as T
from edgedict_tpu.models.beam_search import (
    beam_search_from_encoder, transducer_beam_search)
from edgedict_tpu.models.decoding import (
    greedy_decode_from_encoder, truncate_and_strip)
from edgedict_tpu.models.lm import LMConfig, lm_apply, lm_init, lm_loss

CFG = T.TransducerConfig(
    vocab_size=12, vocab_embed_size=8, input_size=10,
    enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
    joint_size=16, enc_time_reductions=(1,))


def _oracle_best_path(params, cfg, h_enc):
    """Brute-force best path with ≤1 label per frame: per frame either
    blank, or one label followed by blank.  Returns (tokens, logp)."""
    import itertools
    Tn = h_enc.shape[1]
    V = cfg.vocab_size
    labels = [v for v in range(V) if v != cfg.blank]

    empty = jnp.zeros((1, 0), jnp.int32)
    h_dec0, st0 = T.decoder_apply(params['decoder'], cfg, empty)

    best = (None, -np.inf)
    for choice in itertools.product([None] + labels, repeat=Tn):
        h_dec, st = h_dec0[:, 0], st0
        score, toks = 0.0, []
        for t, v in enumerate(choice):
            lp = np.asarray(jax.nn.log_softmax(
                T.joint_apply(params['joint'], h_enc[:, t], h_dec)[0]))
            if v is None:
                score += lp[cfg.blank]
            else:
                score += lp[v]
                h_dec_new, st = T.decoder_apply(
                    params['decoder'], cfg,
                    jnp.asarray([[v]], jnp.int32), st)
                h_dec = h_dec_new[:, 0]
                lp2 = np.asarray(jax.nn.log_softmax(
                    T.joint_apply(params['joint'], h_enc[:, t], h_dec)[0]))
                score += lp2[cfg.blank]
                toks.append(v)
        if score > best[1]:
            best = (toks, float(score))
    return best


@pytest.mark.slow
def test_beam_matches_bruteforce_oracle():
    """A wide beam must find the exact best bounded-alignment path."""
    cfg = T.TransducerConfig(
        vocab_size=4, vocab_embed_size=4, input_size=6,
        enc_hidden_size=8, enc_layers=1, enc_proj_size=6,
        dec_hidden_size=8, dec_layers=1, dec_proj_size=6,
        joint_size=8, enc_time_reductions=())
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)
    h_enc = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6))

    oracle_toks, oracle_logp = _oracle_best_path(params, cfg, h_enc)
    # merge_prefixes=False: this oracle enumerates single ALIGNMENTS, so
    # the beam must score alignments, not alignment-summed prefixes
    toks, n_tok, logp = beam_search_from_encoder(
        params, cfg, h_enc, beam_width=64, max_sym_per_frame=1,
        max_tokens=8, merge_prefixes=False)
    assert abs(float(logp[0]) - oracle_logp) < 1e-4, \
        (float(logp[0]), oracle_logp)
    np.testing.assert_array_equal(
        np.asarray(toks[0][:int(n_tok[0])]), oracle_toks)


def test_wider_beam_no_worse_score():
    """The best beam-search path log-prob must be ≥ the greedy path's."""
    params = T.transducer_init(jax.random.PRNGKey(2), CFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 12))
    _, _, logp1 = beam_search_from_encoder(params, CFG, h_enc,
                                           beam_width=1,
                                           max_sym_per_frame=2)
    _, _, logp8 = beam_search_from_encoder(params, CFG, h_enc,
                                           beam_width=8,
                                           max_sym_per_frame=2)
    assert float(logp8[0]) >= float(logp1[0]) - 1e-4


def test_beam_search_jit_and_xlen():
    params = T.transducer_init(jax.random.PRNGKey(4), CFG)
    xs = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 10))
    xlen = jnp.asarray([16, 8])
    fn = jax.jit(lambda p, x, l: transducer_beam_search(
        p, CFG, x, l, beam_width=4, max_sym_per_frame=2, max_tokens=32))
    toks, n_tok, logp = fn(params, xs, xlen)
    assert toks.shape == (2, 32)
    assert np.isfinite(np.asarray(logp)).all()
    assert int(n_tok[1]) <= 2 * 8      # ≤ max_sym * valid frames

    # shorter xlen must decode identically to truncated input
    toks2, n2, _ = transducer_beam_search(
        params, CFG, xs[1:, :8], jnp.asarray([8]), beam_width=4,
        max_sym_per_frame=2, max_tokens=32)
    np.testing.assert_array_equal(
        np.asarray(toks[1][:int(n_tok[1])]),
        np.asarray(toks2[0][:int(n2[0])]))


def test_lm_loss_and_fusion():
    lm_cfg = LMConfig(vocab_size=12, embed_size=8, hidden_size=8,
                      num_layers=1)
    lm_params = lm_init(jax.random.PRNGKey(0), lm_cfg)
    ys = jnp.asarray([[2, 4, 5, 6, 1], [2, 7, 8, 1, 1]], jnp.int32)
    ylen = jnp.asarray([4, 3])
    loss = lm_loss(lm_params, lm_cfg, ys, ylen)
    assert np.isfinite(float(loss)) and float(loss) > 0

    logp, state = lm_apply(lm_params, lm_cfg, ys[:, :2])
    assert logp.shape == (2, 2, 12)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                               rtol=1e-4)

    params = T.transducer_init(jax.random.PRNGKey(1), CFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 12))
    toks, n_tok, logp = beam_search_from_encoder(
        params, CFG, h_enc, beam_width=4, max_sym_per_frame=2,
        lm=(lm_params, lm_cfg, 0.3))
    assert np.isfinite(float(logp[0]))


def test_streaming_beam_equals_offline_beam():
    """Chunk-carried beam == offline beam on the same encoder outputs
    (state-carry property extended from greedy to beam search)."""
    from edgedict_tpu.features import FeatureConfig
    from edgedict_tpu.stream import StreamingBeamDecoder

    cfg = T.TransducerConfig(
        vocab_size=16, vocab_embed_size=8, input_size=9,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
        joint_size=16, enc_time_reductions=())
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(9), cfg)

    class _Tok:
        unk_id = 3

        def id_to_token(self, i):
            return chr(ord('a') + int(i)) + '</w>'

    dec = StreamingBeamDecoder(params, cfg, feature_cfg, _Tok(),
                               step_n_frame=2, beam_width=4,
                               max_sym_per_frame=2, max_tokens=32)
    rng = np.random.RandomState(1)
    audio = rng.randn(dec.win_size * 4).astype(np.float32) * 0.5
    n = (len(audio) - dec.win_size) // dec.hop_size + 1
    text = ''
    all_feats = []
    for i in range(n):
        chunk = audio[i * dec.hop_size:i * dec.hop_size + dec.win_size]
        text = dec.decode(chunk)
        feats, _ = dec.pipeline(jnp.asarray(chunk, jnp.float32)[None],
                                jnp.asarray([dec.win_size]))
        all_feats.append(feats)

    # offline: same per-chunk features concatenated, full-sequence beam
    h_enc, _ = T.encoder_apply(params['encoder'], cfg,
                               jnp.concatenate(all_feats, axis=1))
    toks, n_tok, _ = beam_search_from_encoder(
        params, cfg, h_enc, beam_width=4, max_sym_per_frame=2,
        max_tokens=32)
    offline = ''.join(chr(ord('a') + int(t)) + ' '
                      for t in np.asarray(toks[0][:int(n_tok[0])])
                      if t > 3)
    assert text == offline, (text, offline)


@pytest.mark.slow
def test_prefix_merging_matches_lattice_posterior():
    """With prefix merging, an exhaustive beam's best score equals the true
    sequence posterior max_y log P(y|x) computed by the lattice DP — the
    exact Graves objective (prefix-probability summation)."""
    import itertools
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss

    cfg = T.TransducerConfig(
        vocab_size=4, vocab_embed_size=4, input_size=6,
        enc_hidden_size=8, enc_layers=1, enc_proj_size=6,
        dec_hidden_size=8, dec_layers=1, dec_proj_size=6,
        joint_size=8, enc_time_reductions=())
    params = T.transducer_init(jax.random.PRNGKey(3), cfg)
    h_enc = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 6))

    # enumerate every label sequence with |y| <= 3; score with the lattice
    best_y, best_lp = None, -np.inf
    for n in range(0, 4):
        for y in itertools.product([1, 2, 3], repeat=n):
            ys = jnp.asarray([list(y) + [0] * (3 - n)], jnp.int32)
            h_dec, _ = T.decoder_apply(params['decoder'], cfg,
                                       ys[:, :max(n, 1)] if n else
                                       jnp.zeros((1, 0), jnp.int32))
            # full-lattice logits for this y
            h_dec_full, _ = T.decoder_apply(params['decoder'], cfg, ys)
            logits = T.joint_apply(params['joint'], h_enc, h_dec_full)
            lp = -float(rnnt_loss(logits, ys, jnp.asarray([3]),
                                  jnp.asarray([n]))[0])
            if lp > best_lp:
                best_y, best_lp = list(y), lp

    toks, n_tok, logp = beam_search_from_encoder(
        params, cfg, h_enc, beam_width=64, max_sym_per_frame=3,
        max_tokens=4, merge_prefixes=True)
    assert abs(float(logp[0]) - best_lp) < 1e-3, (float(logp[0]), best_lp)
    assert list(np.asarray(toks[0][:int(n_tok[0])])) == best_y


def test_load_lm_checkpoint_roundtrip(tmp_path):
    """cli.train_lm's lm.ckpt format → load_lm_checkpoint (template-free)
    → identical params/config, usable for streaming fusion."""
    from edgedict_tpu.checkpoint import save_checkpoint
    from edgedict_tpu.models.lm import load_lm_checkpoint

    cfg = LMConfig(vocab_size=12, embed_size=16, hidden_size=16,
                   num_layers=1, tie_weights=True)
    params = lm_init(jax.random.PRNGKey(0), cfg)
    logdir = str(tmp_path)
    path = save_checkpoint(logdir, 7, params,
                           extra={'lm_cfg': cfg.__dict__})
    got_params, got_cfg = load_lm_checkpoint(path)
    assert got_cfg == cfg
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, got_params)
    # loaded LM drives fusion in the offline beam search
    tparams = T.transducer_init(jax.random.PRNGKey(1), CFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 12))
    toks, n_tok, _ = beam_search_from_encoder(
        tparams, CFG, h_enc, beam_width=2,
        lm=(got_params, got_cfg, 0.3))
    assert np.asarray(toks).shape[0] == 1 and int(np.asarray(n_tok)[0]) >= 0
