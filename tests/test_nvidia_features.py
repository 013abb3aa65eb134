"""NVIDIA alt featurizer family (reference parts/features.py:125-398)."""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.data.nvidia_features import (
    AudioPreprocessing, FeatureFactory, NvidiaFeatConfig,
    NvidiaFilterbankFeatures, SpectrogramFeatures, splice_frames)


def test_logfbank_matches_main_pipeline():
    """With matching geometry (hann window, same n_fft/hop, no splicing,
    no normalize) the NVIDIA filterbank path == the main FeaturePipeline's
    pre-downsample log-mel, transposed to the NVIDIA (B, F, T) layout."""
    from edgedict_tpu.features import FeatureConfig, FeaturePipeline

    sr = 16000
    cfg = NvidiaFeatConfig(
        sample_rate=sr, window_size=320 / sr, window_stride=200 / sr,
        window='hann', normalize='none', n_fft=512, nfilt=80,
        dither=0.0, pad_to=0, frame_splicing=1)
    nv = NvidiaFilterbankFeatures(cfg)

    main = FeaturePipeline(FeatureConfig(
        feature_type='logfbank', feature_size=80, n_fft=512,
        win_length=320, hop_length=200, downsample=1,
        pad_to_divisible=True))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9000).astype(np.float32))
    xlen = jnp.asarray([9000, 6000], jnp.int32)
    got = nv(x, xlen)                       # (B, 80, T)
    want, _ = main(x, xlen, train=False)    # (B, T, 80)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.swapaxes(want, 1, 2)),
                               rtol=1e-4, atol=1e-4)


def test_spectrogram_is_log_magnitude():
    cfg = NvidiaFeatConfig(
        sample_rate=16000, window_size=0.02, window_stride=0.0125,
        window='hamming', normalize='none', dither=0.0, pad_to=0, log=True)
    spec = SpectrogramFeatures(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4000).astype(np.float32))
    xlen = jnp.asarray([4000], jnp.int32)
    got = np.asarray(spec(x, xlen))
    assert got.shape[1] == cfg.fft_size // 2 + 1    # freq bins, no mel
    # log of a magnitude: exp(got) must be the sqrt of a power — positive
    assert np.all(np.exp(got[..., :int(xlen[0]) // cfg.hop_length]) >= 0)


def test_splice_frames_roll_semantics():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 2, 6)
    out = np.asarray(splice_frames(x, 2))
    assert out.shape == (1, 4, 6)
    # rows 2:4 are x shifted left by one frame, edge repeated
    np.testing.assert_array_equal(out[0, 2, :-1], np.asarray(x)[0, 0, 1:])
    np.testing.assert_array_equal(out[0, 2, -1], np.asarray(x)[0, 0, -1])


def test_pad_to_and_factory():
    cfg = dict(sample_rate=16000, window_size=0.02, window_stride=0.01,
               features=64, normalize='per_feature', dither=0.0,
               pad_to=8, frame_splicing=2, feat_type='logfbank')
    feat = FeatureFactory.from_config(cfg)
    assert isinstance(feat, NvidiaFilterbankFeatures)
    assert feat.cfg.log
    x = jnp.asarray(np.random.RandomState(2).randn(1, 5000), jnp.float32)
    out = feat(x, jnp.asarray([5000], jnp.int32))
    assert out.shape[1] == 64 * 2                  # spliced feature dim
    assert out.shape[2] % 8 == 0                   # pad_to

    pre = AudioPreprocessing(**dict(cfg, transpose_out=True))
    out1 = pre(x[0])
    assert out1.shape[1] == 64 * 2 and out1.ndim == 2


def test_stft_factory_default():
    feat = FeatureFactory.from_config(dict(
        sample_rate=8000, window_size=0.02, window_stride=0.01,
        dither=0.0, pad_to=0))
    assert isinstance(feat, SpectrogramFeatures)
    assert feat.cfg.log                            # 'logspect' default
