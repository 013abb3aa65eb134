"""Native C++ components: the three-way RNN-T loss parity ladder, CharBPE
engine parity, bucketing behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edgedict_tpu import native

pytestmark = pytest.mark.skipif(
    not all(native.available().values()),
    reason='native libs not built (make -C native)')


def _random_lattice(rng, b=3, t=6, u=4, v=8):
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = rng.randint(1, v, (b, u)).astype(np.int32)
    xlen = np.asarray([t, t - 1, t - 2], np.int32)[:b]
    ylen = np.asarray([u, u - 1, u - 2], np.int32)[:b]
    return logits, labels, xlen, ylen


def test_rnnt_loss_three_way_parity():
    """C++ CPU == pure-lax reference == production associative-scan loss,
    for values AND gradients (SURVEY.md §7 step 3 parity ladder)."""
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_reference
    rng = np.random.RandomState(0)
    logits, labels, xlen, ylen = _random_lattice(rng)

    loss_cpp, grad_cpp = native.rnnt_loss_cpu(logits, labels, xlen, ylen,
                                              blank=0)
    loss_ref = np.asarray(rnnt_loss_reference(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(xlen),
        jnp.asarray(ylen)))
    loss_prod = np.asarray(rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(xlen),
        jnp.asarray(ylen)))
    np.testing.assert_allclose(loss_cpp, loss_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(loss_cpp, loss_prod, rtol=1e-4, atol=1e-4)

    grad_prod = np.asarray(jax.grad(
        lambda lg: jnp.sum(rnnt_loss(lg, jnp.asarray(labels),
                                     jnp.asarray(xlen),
                                     jnp.asarray(ylen))))(
        jnp.asarray(logits)))
    np.testing.assert_allclose(grad_cpp, grad_prod, rtol=1e-3, atol=1e-4)

    grad_ref = np.asarray(jax.grad(
        lambda lg: jnp.sum(rnnt_loss_reference(lg, jnp.asarray(labels),
                                               jnp.asarray(xlen),
                                               jnp.asarray(ylen))))(
        jnp.asarray(logits)))
    np.testing.assert_allclose(grad_cpp, grad_ref, rtol=1e-3, atol=1e-4)


def test_native_bpe_matches_python():
    """Native merge engine == pure-Python CharBPE on random merge tables."""
    from edgedict_tpu.tokenizer import CharBPE
    vocab = {'<nul>': 0, '<pad>': 1, '<bos>': 2, '<unk>': 3}
    for ch in 'abcd':
        vocab[ch] = len(vocab)
        vocab[ch + '</w>'] = len(vocab)
    merges = [('a', 'b'), ('ab', 'c</w>'), ('c', 'd</w>'), ('b', 'c</w>')]
    for left, right in merges:
        vocab.setdefault(left + right, len(vocab))
    py = CharBPE(vocab, merges)

    # build the id-level merge table for the native engine
    merges_ids = [(vocab[l], vocab[r], vocab[l + r]) for l, r in merges]
    nat = native.NativeBPE(merges_ids)

    inv = {v: k for k, v in vocab.items()}
    for word in ['abc', 'abcd', 'bc', 'dcba', 'a', 'abab']:
        want = py._bpe_word(word)           # list of token strings
        syms = [c for c in word[:-1]] + [word[-1] + '</w>']
        got_ids = nat.encode_word([vocab[s] for s in syms])
        got = [inv[i] for i in got_ids]
        assert got == want, (word, got, want)


def test_batch_by_size_token_budget():
    lengths = [5, 5, 5, 9, 9, 20]
    batches = native.batch_by_size(list(range(6)), lengths, max_tokens=20)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(6))
    for b in batches:
        max_len = max(lengths[i] for i in b)
        assert max_len * len(b) <= 20 or len(b) == 1


def test_batch_fixed_shapes_menu():
    lengths = [20, 18, 9, 9, 8, 5, 4]           # sorted descending
    shapes = [(2, 24), (4, 12), (8, 6)]
    batches = native.batch_fixed_shapes(list(range(7)), lengths, shapes)
    flat = [i for b, _ in batches for i in b]
    assert sorted(flat) == list(range(7))
    for idxs, (bsz, max_len) in batches:
        assert len(idxs) <= bsz
        assert all(lengths[i] <= max_len for i in idxs)


def test_flac_decoder_reference_utterance():
    """Decode the reference repo's bundled LibriSpeech demo utterance
    (3729-6852-0035.flac, the pinned asset of SURVEY §4d) with the native
    decoder and check speech-signal invariants."""
    import os
    path = '/root/reference/3729-6852-0035.flac'
    if not os.path.exists(path) or not native.available().get('flac'):
        pytest.skip('reference flac or native lib unavailable')
    audio, sr = native.read_flac(path)
    assert sr == 16000
    assert 20.0 < len(audio) / sr < 21.5          # known ~20.65 s clip
    assert np.abs(audio).max() <= 1.0
    rms = float(np.sqrt((audio ** 2).mean()))
    assert 0.01 < rms < 0.3                        # speech-level energy
    # LPC reconstruction sanity: strong sample-to-sample correlation
    c = np.corrcoef(audio[:-1], audio[1:])[0, 1]
    assert c > 0.8

    # loads through the generic audio loader too
    from edgedict_tpu.data import load_audio
    a2, sr2 = load_audio(path)
    np.testing.assert_allclose(a2, audio)


def test_native_bpe_trainer_matches_python():
    """Native incremental trainer == pure-Python from-scratch trainer on
    random corpora (same merges, same vocab, same tie-breaking)."""
    import random
    from edgedict_tpu.tokenizer import CharBPE

    rng = random.Random(0)
    words = ['the', 'thin', 'this', 'that', 'cat', 'cart', 'car', 'art',
             'tart', 'hat', 'chat', 'than', 'ant', 'rat', 'tin', 'hint']
    texts = [' '.join(rng.choice(words) for _ in range(20))
             for _ in range(60)]
    specials = ['<nul>', '<pad>', '<bos>', '<unk>']

    import edgedict_tpu.tokenizer as tok_mod
    # force the python path by training with native disabled
    import edgedict_tpu.native as nat
    saved = nat._bpe_tr
    try:
        nat._bpe_tr = None
        py = CharBPE.train(texts, 64, specials)
    finally:
        nat._bpe_tr = saved
    assert nat._bpe_tr is not None, 'native trainer not built'
    cc = CharBPE.train(texts, 64, specials)

    assert cc.merges == py.merges
    assert cc.vocab == py.vocab
    s = 'that thin cat chatted in the cart'
    assert cc.encode(s) == py.encode(s)


def test_flac_decoder_rejects_garbage():
    """Corrupt input surfaces as a clean error, never a crash or silent
    wrong audio (the reference aborted the whole run on a corrupt file,
    rnnt/dataset.py:97-101; here the loader surfaces the exception)."""
    import pytest

    from edgedict_tpu import native
    if not native.flac_available():
        pytest.skip('native flac decoder not built')
    import tempfile

    with tempfile.NamedTemporaryFile(suffix='.flac') as f:
        f.write(b'not a flac stream at all' * 10)
        f.flush()
        with pytest.raises(ValueError, match='FLAC'):
            native.read_flac(f.name)

    # truncated real stream: header parses, frames cut off mid-way ->
    # decode returns what it could or errors, but never crashes
    real = open('/root/reference/3729-6852-0035.flac', 'rb').read()
    with tempfile.NamedTemporaryFile(suffix='.flac') as f:
        f.write(real[:len(real) // 2])
        f.flush()
        try:
            audio, sr = native.read_flac(f.name)
            assert sr == 16000 and 0 < len(audio) < 330400
        except ValueError:
            pass
