"""Text normalization, perturbations, segments, manifests."""

import json

import numpy as np

from edgedict_tpu.text import (
    english_cleaners, normalize_numbers, number_to_words, ordinal_to_words)


def test_number_to_words():
    assert number_to_words(0) == 'zero'
    assert number_to_words(7) == 'seven'
    assert number_to_words(21) == 'twenty one'
    assert number_to_words(105) == 'one hundred five'
    assert number_to_words(1234) == 'one thousand two hundred thirty four'
    assert number_to_words(2000000) == 'two million'


def test_ordinals_and_numbers_in_text():
    assert ordinal_to_words(1) == 'first'
    assert ordinal_to_words(22) == 'twenty second'
    assert ordinal_to_words(30) == 'thirtieth'
    assert normalize_numbers('the 3rd time') == 'the third time'
    assert normalize_numbers('$2.50') == 'two dollars fifty cents'
    assert normalize_numbers('in 1984') == 'in nineteen eighty four'
    assert normalize_numbers('3.14') == 'three point one four'
    assert normalize_numbers('1,000 men') == 'one thousand men'


def test_english_cleaners():
    out = english_cleaners('Dr. Smith paid $5 on the 2nd of May, 1999.')
    assert out == ('doctor smith paid five dollars on the second of may, '
                   'nineteen ninety nine.')
    assert english_cleaners('Café') == 'cafe'


def test_perturbations_and_segment():
    from edgedict_tpu.data.perturb import AudioAugmentor
    from edgedict_tpu.data.segment import AudioSegment, resample

    rng = np.random.RandomState(0)
    samples = rng.randn(16000).astype(np.float32)
    seg = AudioSegment(samples, 16000)
    assert abs(seg.duration - 1.0) < 1e-6

    aug = AudioAugmentor.from_config({
        'speed': {'prob': 1.0, 'min_speed_rate': 0.9,
                  'max_speed_rate': 1.1},
        'gain': {'prob': 1.0, 'min_gain_dbfs': -6, 'max_gain_dbfs': 6},
        'shift': {'prob': 1.0},
    }, rng=np.random.RandomState(1))
    aug.perturb(seg)
    assert np.isfinite(seg.samples).all()
    assert 0.8 < seg.duration < 1.25

    # resample round trip roughly preserves a sine
    t = np.linspace(0, 1, 16000, endpoint=False)
    sine = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    down = resample(sine, 16000, 8000)
    up = resample(down, 8000, 16000)
    assert len(up) == 16000
    assert np.corrcoef(sine[500:-500], up[500:-500])[0, 1] > 0.99


def test_manifest(tmp_path):
    from edgedict_tpu.data.manifest import Manifest
    p = tmp_path / 'm.json'
    rows = [
        {'audio_filepath': 'a.wav', 'duration': 2.0, 'text': 'Hello 3rd'},
        {'audio_filepath': 'b.wav', 'duration': 50.0, 'text': 'too long'},
        {'audio_filepath': 'c.wav', 'duration': 1.0, 'text': 'ok'},
    ]
    p.write_text('\n'.join(json.dumps(r) for r in rows))
    m = Manifest([str(p)], max_duration=16.7, sort_by_duration=True)
    assert len(m) == 2
    assert m[0]['duration'] == 1.0
    assert m[1]['text'] == 'hello third'
    assert m.filtered_duration == 50.0


def test_numpy_seed_context():
    from edgedict_tpu.utils import numpy_seed
    np.random.seed(123)
    with numpy_seed(7):
        a = np.random.rand(3)
    with numpy_seed(7):
        b = np.random.rand(3)
    np.testing.assert_allclose(a, b)
    # outer stream restored
    np.random.seed(123)
    before = np.random.rand(3)
    np.random.seed(123)
    with numpy_seed(7):
        np.random.rand(10)
    after = np.random.rand(3)
    np.testing.assert_allclose(before, after)


def test_dataloader_propagates_worker_errors():
    from edgedict_tpu.data import DataLoader

    class Bad:
        data = [{'audio_length': 1}] * 4

        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise RuntimeError('corrupt sample')
            return np.zeros(10, np.float32), np.asarray([4], np.int32)

    loader = DataLoader(Bad(), batch_size=2, shuffle=False, prefetch=2)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match='corrupt sample'):
        for _ in loader:
            pass


def test_dataloader_workers_deterministic():
    """Thread-pool sample decode yields exactly the single-threaded
    batches (order preserved by Executor.map), for every worker count."""
    from edgedict_tpu.data import DataLoader

    class DS:
        data = [{'audio_length': i % 5} for i in range(16)]

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return (np.full(8, float(i), np.float32),
                    np.asarray([i + 4], np.int32))

    def batches(workers):
        loader = DataLoader(DS(), batch_size=4, shuffle=True, seed=3,
                            workers=workers)
        return [{k: v.copy() for k, v in b.items()} for b in loader]

    ref = batches(1)
    for w in (2, 4):
        got = batches(w)
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
