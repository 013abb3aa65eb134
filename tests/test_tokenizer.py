"""Tokenizer tests.

The load-bearing test is encode-parity of our pure-Python CharBPE engine
against huggingface/tokenizers on the reference-bundled BPE-1024 vocab
(/root/reference/BPE-1024), which released reference checkpoints depend on.
"""

import os

import pytest

from edgedict_tpu.tokenizer import (
    BOS, CharBPE, CharTokenizer, HuggingFaceTokenizer, NUL, PAD, UNK)

REF_BPE = '/root/reference/BPE-1024'

SENTENCES = [
    'might have a solution it might take a long time nobody wrote down the '
    'rules clearly who designed this',
    'the quick brown fox jumps over the lazy dog',
    'supercalifragilisticexpialidocious antidisestablishmentarianism',
    'a b c d e f g',
    "it's a weird-token; with punctuation, isn't it?",
    'HELLO WORLD UPPER CASE',
    'zzzzz qqqq xylophone rhythm',
]


def test_special_token_scheme():
    assert (NUL, PAD, BOS, UNK) == (0, 1, 2, 3)


@pytest.mark.skipif(not os.path.exists(REF_BPE), reason='no reference vocab')
def test_charbpe_parity_with_hf_on_reference_vocab():
    tokenizers = pytest.importorskip('tokenizers')
    hf = tokenizers.CharBPETokenizer(
        os.path.join(REF_BPE, '-vocab.json'),
        os.path.join(REF_BPE, '-merges.txt'), lowercase=True)
    ours = CharBPE.from_files(
        os.path.join(REF_BPE, '-vocab.json'),
        os.path.join(REF_BPE, '-merges.txt'))
    for s in SENTENCES:
        assert ours.encode(s) == hf.encode(s).ids, s


@pytest.mark.skipif(not os.path.exists(REF_BPE), reason='no reference vocab')
def test_charbpe_decode_roundtrip_reference_vocab():
    ours = CharBPE.from_files(
        os.path.join(REF_BPE, '-vocab.json'),
        os.path.join(REF_BPE, '-merges.txt'))
    s = 'the quick brown fox jumps over the lazy dog'
    assert ours.decode(ours.encode(s)) == s


@pytest.mark.skipif(not os.path.exists(REF_BPE), reason='no reference vocab')
def test_hf_wrapper_loads_legacy_cache_layout():
    tok = HuggingFaceTokenizer(REF_BPE, vocab_size=1024)
    assert tok.tokenizer is not None
    assert tok.vocab_size == 1024
    # v1 scheme: <unk>=2 detected, so decode drops ids ≤ 2
    s = 'hello world'
    ids = tok.encode(s)
    assert tok.decode(ids) == s


def test_char_tokenizer_build_encode_decode(tmp_path):
    tok = CharTokenizer(str(tmp_path / 'chars'))
    tok.build(['hello world', 'abc xyz'])
    ids = tok.encode('hello xyz')
    assert all(isinstance(i, int) for i in ids)
    assert tok.decode(ids) == 'hello xyz'
    # unknown chars map to UNK and decode to ''
    ids2 = tok.encode('hello Q#')
    assert UNK in ids2
    # load round-trip
    tok2 = CharTokenizer(str(tmp_path / 'chars'))
    tok2.load()
    assert tok2.token2id == tok.token2id


def test_bpe_train_and_cache(tmp_path):
    texts = [s for s in SENTENCES for _ in range(5)]
    tok = HuggingFaceTokenizer(str(tmp_path / 'bpe'), vocab_size=200)
    tok.build(texts)
    assert tok.vocab_size <= 200
    s = 'might have a solution'
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    # reload from cache
    tok2 = HuggingFaceTokenizer(str(tmp_path / 'bpe'), vocab_size=200)
    assert tok2.tokenizer is not None
    assert tok2.encode(s) == ids


def test_pure_python_bpe_trainer():
    texts = ['the cat sat on the mat ' * 10, 'the dog sat on the log ' * 10]
    bpe = CharBPE.train(texts, vocab_size=60,
                        special_tokens=['<nul>', '<pad>', '<bos>', '<unk>'])
    s = 'the cat sat'
    assert bpe.decode(bpe.encode(s)) == s


def test_wer_metric():
    from edgedict_tpu.metrics import cer, wer
    assert wer('a b c', 'a b c') == 0.0
    assert wer('a b c', 'a x c') == pytest.approx(1 / 3)
    assert wer(['a b', 'c d'], ['a b', 'c x']) == pytest.approx(1 / 4)
    assert cer('abc', 'abc') == 0.0
    assert cer('abc', 'axc') == pytest.approx(1 / 3)


def test_compute_measures():
    from edgedict_tpu.metrics import compute_measures, wer
    m = compute_measures(['the cat sat on the mat'],
                         ['the cat sit on mat here'])
    assert m['substitutions'] + m['deletions'] + m['insertions'] == 3
    assert abs(m['wer'] - wer(['the cat sat on the mat'],
                              ['the cat sit on mat here'])) < 1e-9
    assert compute_measures(['a b c d'], ['a c'])['deletions'] == 2
    assert compute_measures(['a'], ['a b'])['insertions'] == 1
    assert compute_measures(['a b'], ['a c'])['substitutions'] == 1
    perfect = compute_measures(['a b c'], ['a b c'])
    assert perfect['wer'] == 0 and perfect['hits'] == 3
