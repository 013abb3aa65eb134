"""Feature frontend tests: parity against independent numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edgedict_tpu import features as F


def _np_stft_power(x, window, n_fft, hop):
    """Independent numpy STFT reference (center=True, reflect pad)."""
    p = n_fft // 2
    xp = np.pad(x, (p, p), mode='reflect')
    t = 1 + (len(xp) - n_fft) // hop
    out = np.zeros((t, n_fft // 2 + 1))
    for i in range(t):
        fr = xp[i * hop:i * hop + n_fft] * window
        sp = np.fft.rfft(fr)
        out[i] = np.abs(sp) ** 2
    return out


def test_stft_power_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1000).astype(np.float32)
    n_fft, hop = 256, 80
    window = np.pad(F.hann_window(200, periodic=False), (28, 28))
    got = np.asarray(F.stft_power(jnp.asarray(x), jnp.asarray(window),
                                  n_fft, hop))
    for b in range(2):
        want = _np_stft_power(x[b], window, n_fft, hop)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_mel_filters_shape_and_coverage():
    fb = F.mel_filters(16000, 512, 80)
    assert fb.shape == (80, 257)
    # every filter is a triangle: nonneg, has a peak, increasing center freqs
    assert (fb >= 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # htk variant differs from slaney
    fb_htk = F.mel_filters(16000, 512, 80, htk=True, norm=None)
    assert not np.allclose(fb, fb_htk)


def test_mel_filters_slaney_norm_area():
    """Slaney norm makes each filter's area ≈ 2/bandwidth · triangle area:
    check against direct triangle construction."""
    sr, n_fft, n_mels = 16000, 512, 40
    fb = F.mel_filters(sr, n_fft, n_mels)
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = F.mel_to_hz(np.linspace(F.hz_to_mel(0), F.hz_to_mel(sr / 2),
                                      n_mels + 2))
    for m in range(0, n_mels, 7):
        lo, c, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        tri = np.clip(np.minimum((freqs - lo) / (c - lo),
                                 (hi - freqs) / (hi - c)), 0, None)
        tri *= 2.0 / (hi - lo)
        np.testing.assert_allclose(fb[m], tri, atol=1e-6)


def test_dct_matrix_orthonormal():
    d = F.dct_matrix(40, 128)
    assert d.shape == (128, 40)
    np.testing.assert_allclose(d.T @ d, np.eye(40), atol=1e-5)


def test_preemphasis():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    y = np.asarray(F.preemphasis(x, 0.5))
    np.testing.assert_allclose(y, [[1.0, 1.5, 2.0, 2.5]])


def test_compute_deltas_replicate_padding():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 4).astype(np.float32)
    got = np.asarray(F.compute_deltas(jnp.asarray(x)))
    # manual reference
    n, denom = 2, 10.0
    xp = np.concatenate([np.repeat(x[:, :1], n, 1), x,
                         np.repeat(x[:, -1:], n, 1)], axis=1)
    want = np.zeros_like(x)
    for t in range(10):
        for i in range(1, n + 1):
            want[:, t] += i * (xp[:, t + n + i] - xp[:, t + n - i])
    want /= denom
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_downsample_stack_pad_and_truncate():
    x = jnp.arange(2 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 3)
    lens = jnp.asarray([7, 5])
    y, ly = F.downsample_stack(x, lens, 3, pad_to_divisible=True)
    assert y.shape == (2, 3, 9)
    assert list(np.asarray(ly)) == [3, 2]
    # stacking concatenates consecutive frames along features
    np.testing.assert_allclose(np.asarray(y)[0, 0],
                               np.asarray(x)[0, :3].reshape(-1))
    y2, ly2 = F.downsample_stack(x, lens, 3, pad_to_divisible=False)
    assert y2.shape == (2, 2, 9)
    assert list(np.asarray(ly2)) == [2, 1]


def test_normalize_batch_per_feature_masked():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 12, 5).astype(np.float32) * 3 + 1
    lens = np.asarray([12, 8])
    got = np.asarray(F.normalize_batch(jnp.asarray(x), jnp.asarray(lens),
                                       'per_feature'))
    for b, L in enumerate(lens):
        mean = x[b, :L].mean(axis=0)
        std = x[b, :L].std(axis=0, ddof=1) + 1e-5
        np.testing.assert_allclose(got[b, :L], (x[b, :L] - mean) / std,
                                   rtol=1e-3, atol=1e-4)


def test_spec_augment_masks_zero_fill():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4, 50, 20))
    y = np.asarray(F.spec_augment(key, x, t_mask=10, t_num=2,
                                  f_mask=5, f_num=1))
    assert y.shape == x.shape
    assert ((y == 0) | (y == 1)).all()
    assert (y == 0).any()          # some masking happened
    assert y.mean() > 0.5          # but bounded


def test_pipeline_shapes_and_jit():
    cfg = F.FeatureConfig(feature_type='logfbank', feature_size=80,
                          n_fft=512, win_length=400, hop_length=200,
                          downsample=3, T_mask=5, T_num_mask=1,
                          F_mask=3, F_num_mask=1)
    assert cfg.input_size == 240
    pipe = F.FeaturePipeline(cfg)
    audio = jnp.asarray(np.random.RandomState(3).randn(2, 16000),
                        jnp.float32)
    lens = jnp.asarray([16000, 8000])
    fn = jax.jit(lambda a, l, k: pipe(a, l, rng=k, train=True))
    feat, flen = fn(audio, lens, jax.random.PRNGKey(0))
    t_expected = pipe.num_frames(16000)
    assert feat.shape == (2, t_expected, 240)
    assert int(flen[0]) == -(-(-(-16000 // 200)) // 3)  # ceil(ceil(L/hop)/3)
    # test path deterministic
    f1, _ = pipe(audio, lens, train=False)
    f2, _ = pipe(audio, lens, train=False)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))


def test_pipeline_mfcc_and_melspec():
    for ft in ('mfcc', 'melspec'):
        cfg = F.FeatureConfig(feature_type=ft, feature_size=40)
        pipe = F.FeaturePipeline(cfg)
        audio = jnp.asarray(np.random.RandomState(4).randn(1, 8000),
                            jnp.float32)
        feat, flen = pipe(audio, jnp.asarray([8000]), train=False)
        assert feat.shape[-1] == 40
        assert np.isfinite(np.asarray(feat)).all()


def test_build_transform_reference_signature():
    train_fn, test_fn, input_size = F.build_transform(
        'logfbank', 80, downsample=3, T_mask=50, T_num_mask=2,
        F_mask=5, F_num_mask=1)
    assert input_size == 240
    audio = jnp.zeros((1, 4000))
    lens = jnp.asarray([4000])
    ftr, _ = train_fn(audio, lens, jax.random.PRNGKey(0))
    fte, _ = test_fn(audio, lens)
    assert ftr.shape == fte.shape


def test_time_warp():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 60, 8), jnp.float32)
    y = F.time_warp(key, x, warp_param=10)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # endpoints are fixed points of the piecewise-linear warp
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[:, -1]), np.asarray(x[:, -1]),
                               atol=1e-5)
    # warp actually moves interior frames
    assert float(jnp.abs(y[:, 1:-1] - x[:, 1:-1]).max()) > 0
    # too-short inputs pass through untouched
    short = x[:, :15]
    np.testing.assert_allclose(np.asarray(F.time_warp(key, short, 10)),
                               np.asarray(short))


def test_pallas_featurization_parity(monkeypatch):
    """The fused Pallas featurization kernel (interpret mode here; the
    production TPU front) == the XLA stft path for every feature type,
    including odd lengths that exercise the frame-tile padding."""
    import jax.numpy as jnp
    from edgedict_tpu.features import FeatureConfig, FeaturePipeline

    rng = np.random.RandomState(7)
    audio = jnp.asarray(rng.randn(3, 9100).astype(np.float32))
    alen = jnp.asarray([9100, 7000, 2500], jnp.int32)
    for ft in ('logfbank', 'melspec', 'mfcc'):
        cfg = FeatureConfig(feature_type=ft, feature_size=40, n_fft=256,
                            win_length=200, hop_length=100, downsample=3,
                            pad_to_divisible=True)
        pipe = FeaturePipeline(cfg)
        monkeypatch.setenv('EDGEDICT_PALLAS_FEAT', '0')
        a, la = pipe(audio, alen, train=False)
        monkeypatch.setenv('EDGEDICT_PALLAS_FEAT', 'force')
        b, lb = pipe(audio, alen, train=False)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-3, err_msg=ft)
