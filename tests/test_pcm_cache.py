"""Decoded-PCM cache (data/dataset.py cache_audio=True): decode once into a
contiguous int16 blob, mmap thereafter, int16 through collate and H2D,
scaled to float on device — bit-identical end to end vs the decode-per-item
float path, and immune to the source files disappearing once built."""

import os

import numpy as np
import jax.numpy as jnp

from edgedict_tpu.data.collate import seq_collate
from edgedict_tpu.data.dataset import Librispeech
from edgedict_tpu.features import FeatureConfig, FeaturePipeline, pcm_to_float
from edgedict_tpu.tokenizer import CharTokenizer

from tests.test_trainer_e2e import _make_corpus


def _corpus(tmp_path, name='libri'):
    root = _make_corpus(str(tmp_path / name))
    tok = CharTokenizer(cache_dir=str(tmp_path / 'tok'))
    tok.build(['HELLO WORLD', 'THE CAT SAT', 'A B C D', 'SPEECH TEST',
               'ONE TWO THREE', 'OPEN THE DOOR', 'CLOSE THE DOOR',
               'TURN IT OFF'])
    return root, tok


def test_cache_matches_decode_path_bitexact(tmp_path):
    root, tok = _corpus(tmp_path)
    plain = Librispeech(root, tok)
    cached = Librispeech(root, tok, cache_audio=True)
    assert os.path.exists(os.path.join(root, 'pcm_v1_label.bin'))
    assert len(plain) == len(cached)
    for i in range(len(plain)):
        a_f, t_f = plain[i]
        a_q, t_q = cached[i]
        assert a_q.dtype == np.int16
        # 16-bit PCM WAV sources round-trip exactly through the cache
        np.testing.assert_array_equal(
            a_q.astype(np.float32) / 32768.0, a_f)
        np.testing.assert_array_equal(t_f, t_q)


def test_cache_survives_source_removal_and_reuse(tmp_path):
    root, tok = _corpus(tmp_path)
    first = Librispeech(root, tok, cache_audio=True)
    ref = [np.asarray(first[i][0]) for i in range(len(first))]
    del first
    # wavs gone: the index + cache alone must serve items (epoch >= 2 /
    # re-run behavior: zero decode work)
    for f in os.listdir(os.path.join(root, '1', '2')):
        if f.endswith('.wav'):
            os.remove(os.path.join(root, '1', '2', f))
    again = Librispeech(root, tok, cache_audio=True)
    for i in range(len(again)):
        np.testing.assert_array_equal(np.asarray(again[i][0]), ref[i])


def test_cache_index_mismatch_detected(tmp_path):
    root, tok = _corpus(tmp_path)
    Librispeech(root, tok, cache_audio=True)
    off_path = os.path.join(root, 'pcm_v1_label.off.npy')
    off = np.load(off_path)
    np.save(off_path, off[:-1])      # corrupt: one record short
    try:
        Librispeech(root, tok, cache_audio=True)
        raise AssertionError('stale cache was not detected')
    except RuntimeError as e:
        assert 'does not match the index' in str(e)


def test_int16_collate_and_device_scaling_bitexact(tmp_path):
    root, tok = _corpus(tmp_path)
    plain = Librispeech(root, tok)
    cached = Librispeech(root, tok, cache_audio=True)
    batch_q = seq_collate([cached[i] for i in range(4)])
    batch_f = seq_collate([plain[i] for i in range(4)])
    assert batch_q['audio'].dtype == np.int16
    assert batch_f['audio'].dtype == np.float32
    np.testing.assert_array_equal(batch_q['alen'], batch_f['alen'])

    # device-side scaling reproduces the host decode exactly
    np.testing.assert_array_equal(
        np.asarray(pcm_to_float(jnp.asarray(batch_q['audio']))),
        batch_f['audio'])

    # and the full featurization pipeline is bit-identical from either
    pipe = FeaturePipeline(FeatureConfig(
        feature_type='logfbank', feature_size=8, n_fft=256, win_length=256,
        hop_length=128, downsample=3))
    f_q, l_q = pipe(jnp.asarray(batch_q['audio']),
                    jnp.asarray(batch_q['alen']))
    f_f, l_f = pipe(jnp.asarray(batch_f['audio']),
                    jnp.asarray(batch_f['alen']))
    np.testing.assert_array_equal(np.asarray(f_q), np.asarray(f_f))
    np.testing.assert_array_equal(np.asarray(l_q), np.asarray(l_f))


def test_transform_hook_still_gets_float(tmp_path):
    root, tok = _corpus(tmp_path)
    seen = []

    def xform(a):
        seen.append(a.dtype)
        return a

    ds = Librispeech(root, tok, cache_audio=True, transform=xform)
    a, _ = ds[0]
    assert a.dtype == np.float32 and seen[0] == np.float32
