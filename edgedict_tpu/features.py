"""Jittable audio feature frontend: log-mel / mel-spectrogram / MFCC.

TPU-native rebuild of the reference feature layer:
  * FilterbankFeatures — dither → preemphasis 0.97 → STFT → power → mel
    filterbank matmul → log → optional normalize → seq-len masking
    (reference rnnt/features.py:33-152)
  * torchaudio-equivalent MelSpectrogram / MFCC paths, CatDeltas, Downsample
    frame-stacking, SpecAugment Time/FrequencyMasking, and build_transform
    (reference rnnt/transforms.py:10-203)

Design differences from the reference (deliberate, TPU-first):
  * Batched and jittable end to end: one (B, L) waveform batch in, one
    (B, T, F) feature batch out, all shapes static.  The reference ran
    per-utterance in dataloader worker processes on CPU; here the whole
    frontend is XLA-compiled so it can run on-device, fused into the train
    step (framing is a gather, the mel projection is an MXU matmul).
  * Time-major (B, T, F) layout throughout (the reference carries (B, F, T)
    and transposes inside Downsample, rnnt/transforms.py:38-51).  Frame
    stacking reshapes identically in this layout.
  * All randomness (dither, SpecAugment masks) is explicit jax PRNG-key
    driven (the reference used global torch/python RNG state).

The mel filterbank/DCT constants are computed in numpy at pipeline-build time
(standard public Slaney/HTK mel math, matching librosa.filters.mel and
torchaudio.functional.melscale_fbanks respectively, which the reference
consumed at rnnt/features.py:80-84 / transforms.py:179-183).
"""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

LOG_GUARD = 1e-20        # reference rnnt/features.py:130
MFCC_LOG_GUARD = 1e-6    # torchaudio MFCC(log_mels=True) guard


# ---------------------------------------------------------------------------
# host-side constants (numpy)
# ---------------------------------------------------------------------------

def hz_to_mel(f, htk=False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep,
                    mel)


def mel_to_hz(m, htk=False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def mel_filters(sample_rate, n_fft, n_mels, f_min=0.0, f_max=None,
                htk=False, norm='slaney'):
    """Triangular mel filterbank (n_mels, n_fft//2 + 1).

    htk=False + norm='slaney' reproduces librosa.filters.mel defaults (the
    logfbank path); htk=True + norm=None reproduces torchaudio's default
    melscale_fbanks (the melspec/mfcc paths)."""
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(f_min, htk), hz_to_mel(f_max, htk),
                          n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))

    if norm == 'slaney':
        enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
        fb = fb * enorm[:, None]
    return fb.astype(np.float32)


def dct_matrix(n_mfcc, n_mels):
    """Orthonormal DCT-II matrix (n_mels, n_mfcc), torchaudio
    create_dct(norm='ortho') layout (applied as mel @ dct)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    dct *= np.sqrt(2.0 / n_mels)
    dct[:, 0] = 1.0 / np.sqrt(n_mels)
    return dct.astype(np.float32)


def hann_window(win_length, periodic):
    """torch.hann_window: periodic=True divides by N, False by N-1."""
    n = np.arange(win_length, dtype=np.float64)
    denom = win_length if periodic else win_length - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# jittable primitives
# ---------------------------------------------------------------------------

def preemphasis(x, coeff=0.97):
    """x[t] - coeff * x[t-1], first sample kept (rnnt/features.py:115-118)."""
    return jnp.concatenate([x[:, :1], x[:, 1:] - coeff * x[:, :-1]], axis=1)


def frame_signal(x, n_fft, hop_length, center=True):
    """(B, L) → (B, T, n_fft) frames; T = 1 + L // hop (torch.stft
    center=True convention, reflect padding of n_fft//2 per side)."""
    if center:
        p = n_fft // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode='reflect')
    num_frames = 1 + (x.shape[1] - n_fft) // hop_length
    idx = (jnp.arange(num_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    return x[:, idx]


def stft_power(x, window, n_fft, hop_length):
    """Power spectrogram |STFT|^2: (B, L) → (B, T, n_fft//2+1).

    `window` is the analysis window zero-padded to n_fft (torch.stft pads
    win_length-sized windows symmetrically to n_fft)."""
    frames = frame_signal(x, n_fft, hop_length)
    frames = frames * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def compute_deltas(feat, win_length=5):
    """torchaudio.functional.compute_deltas over the time axis of (B, T, F):
    d[t] = Σ_n n·(x[t+n] − x[t−n]) / (2 Σ n²), replicate padding."""
    n = (win_length - 1) // 2
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    padded = jnp.concatenate(
        [jnp.repeat(feat[:, :1], n, axis=1), feat,
         jnp.repeat(feat[:, -1:], n, axis=1)], axis=1)
    out = jnp.zeros_like(feat)
    for i in range(1, n + 1):
        t = feat.shape[1]
        out = out + i * (padded[:, n + i:n + i + t]
                         - padded[:, n - i:n - i + t])
    return out / denom


def downsample_stack(feat, lengths, n_frame, pad_to_divisible=True):
    """Frame stacking: (B, T, F) → (B, ceil_or_floor(T/n), n*F)
    (reference Downsample, rnnt/transforms.py:30-51)."""
    if n_frame <= 1:
        return feat, lengths
    b, t, f = feat.shape
    if pad_to_divisible:
        pad = (-t) % n_frame
        if pad:
            feat = jnp.pad(feat, ((0, 0), (0, pad), (0, 0)))
        new_len = (lengths + n_frame - 1) // n_frame
    else:
        t = t - t % n_frame
        feat = feat[:, :t]
        new_len = jnp.minimum(lengths, t) // n_frame
    feat = feat.reshape(b, -1, n_frame * f)
    return feat, new_len


def normalize_batch(feat, lengths, normalize_type):
    """Masked per-utterance normalization on (B, T, F)
    (reference rnnt/features.py:7-30; std is unbiased like torch.std)."""
    if normalize_type not in ('per_feature', 'all_features'):
        return feat
    mask = (jnp.arange(feat.shape[1])[None, :] <
            lengths[:, None]).astype(feat.dtype)[..., None]
    cnt = jnp.sum(mask, axis=1, keepdims=True)
    if normalize_type == 'all_features':
        axes = (1, 2)
        cnt = cnt * feat.shape[2]
        mean = jnp.sum(feat * mask, axis=axes, keepdims=True) / cnt[:, :1]
        var = jnp.sum(((feat - mean) * mask) ** 2, axis=axes,
                      keepdims=True) / jnp.maximum(cnt[:, :1] - 1, 1)
    else:
        mean = jnp.sum(feat * mask, axis=1, keepdims=True) / cnt
        var = jnp.sum(((feat - mean) * mask) ** 2, axis=1,
                      keepdims=True) / jnp.maximum(cnt - 1, 1)
    std = jnp.sqrt(var) + 1e-5
    return (feat - mean) / std


def spec_augment(key, feat, t_mask, t_num, f_mask, f_num):
    """SpecAugment on (B, T, F): per-sample random time and frequency masks,
    zero fill (reference rnnt/transforms.py:54-146: start ~ U[0, dim),
    width ~ U[0, max_width))."""
    b, t, f = feat.shape
    keep = jnp.ones((b, t, f), dtype=bool)

    def apply_masks(keep, key, dim, num, width, axis):
        if num <= 0 or width <= 0:
            return keep
        k1, k2 = jax.random.split(key)
        starts = jax.random.randint(k1, (b, num), 0, dim)
        widths = jax.random.randint(k2, (b, num), 0, width)
        pos = jnp.arange(dim)[None, None, :]
        hit = ((pos >= starts[..., None]) &
               (pos < (starts + widths)[..., None])).any(axis=1)  # (B, dim)
        shape = (b, t, f)
        hit = jnp.expand_dims(hit, axis=2 if axis == 1 else 1)
        return keep & ~jnp.broadcast_to(hit, shape)

    kt, kf = jax.random.split(key)
    keep = apply_masks(keep, kt, t, t_num, t_mask, axis=1)
    keep = apply_masks(keep, kf, f, f_num, f_mask, axis=2)
    return jnp.where(keep, feat, 0.0)


def time_warp(key, feat, warp_param=80, method='linear'):
    """SpecAugment time warping on (B, T, F): a random anchor in
    [W, T−W) is displaced by w ~ U[−W, W].

    method='linear' (default, production): the time axis is piecewise-
    linearly resampled — the 1-D warp the SpecAugment paper actually
    uses; jittable, no spline solve.
    method='spline': the reference's legacy 2-D polyharmonic
    sparse-image-warp (augmentation.py:7-30 + sparse_img_wrap.py),
    rebuilt jittable in ops/image_warp.py (see that module's docstring
    for the two documented deviations from the reference's degenerate
    numerics)."""
    if method == 'spline':
        from edgedict_tpu.ops.image_warp import time_warp_spline
        return time_warp_spline(key, feat, warp_param=warp_param)
    b, t, f = feat.shape
    if t <= 2 * warp_param + 1:
        return feat
    k1, k2 = jax.random.split(key)
    center = jax.random.randint(k1, (b,), warp_param, t - warp_param)
    shift = jax.random.randint(k2, (b,), -warp_param, warp_param + 1)
    src_center = (center + shift).astype(jnp.float32)
    center = center.astype(jnp.float32)

    pos = jnp.arange(t, dtype=jnp.float32)[None, :]       # output grid
    # piecewise-linear source coordinates: [0, center]→[0, src_center],
    # [center, T−1]→[src_center, T−1]
    left = pos / jnp.maximum(center[:, None], 1.0) * src_center[:, None]
    right = (src_center[:, None]
             + (pos - center[:, None])
             / jnp.maximum(t - 1 - center[:, None], 1.0)
             * (t - 1 - src_center[:, None]))
    src = jnp.where(pos <= center[:, None], left, right)
    src = jnp.clip(src, 0.0, t - 1.0)

    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (src - lo.astype(jnp.float32))[..., None]
    gather = lambda idx: jnp.take_along_axis(feat, idx[..., None], axis=1)
    return gather(lo) * (1.0 - w) + gather(hi) * w


def trim_audio(audio, lengths, sample_rate, max_seconds, truncate_end=True):
    """Host/device-side raw-audio trim (reference TrimAudio,
    rnnt/transforms.py:149-163)."""
    max_len = int(sample_rate * max_seconds)
    if audio.shape[1] <= max_len:
        return audio, lengths
    if truncate_end:
        audio = audio[:, :max_len]
    else:
        audio = audio[:, -max_len:]
    return audio, jnp.minimum(lengths, max_len)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    feature_type: str = 'logfbank'   # 'mfcc' | 'melspec' | 'logfbank'
    feature_size: int = 80
    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 400
    hop_length: int = 200
    dither: float = 1e-5
    preemph: float = 0.97
    normalize: str = 'none'
    delta: bool = False
    downsample: int = 1
    pad_to_divisible: bool = True
    T_mask: int = 0
    T_num_mask: int = 0
    F_mask: int = 0
    F_num_mask: int = 0
    W_warp: int = 0                  # SpecAugment time-warp parameter
    mfcc_n_mels: int = 128           # torchaudio MFCC default

    @property
    def input_size(self):
        size = self.feature_size
        if self.delta:
            size *= 3
        return size * max(1, self.downsample)

    @classmethod
    def from_flags(cls, FLAGS, pad_to_divisible=True):
        return cls(
            feature_type=FLAGS.feature,
            feature_size=FLAGS.feature_size,
            n_fft=FLAGS.n_fft,
            win_length=FLAGS.win_length,
            hop_length=FLAGS.hop_length,
            delta=FLAGS.delta,
            normalize='per_feature' if FLAGS.cmvn else 'none',
            downsample=FLAGS.downsample,
            pad_to_divisible=pad_to_divisible,
            T_mask=FLAGS.T_mask, T_num_mask=FLAGS.T_num_mask,
            F_mask=FLAGS.F_mask, F_num_mask=FLAGS.F_num_mask,
            W_warp=getattr(FLAGS, 'time_warp_w', 0),
        )


def _pallas_feat_eligible(cfg):
    """Fused featurization kernel dispatch: TPU by default (force|0 to
    override), any feature_type (the kernel computes mel power; log/DCT
    stay outside)."""
    import os
    del cfg
    mode = os.environ.get('EDGEDICT_PALLAS_FEAT', '1')
    if mode == '0':
        return False
    return mode == 'force' or jax.default_backend() == 'tpu'


def pcm_to_float(audio):
    """int16 PCM → float32 in [-1, 1) on device (1/32768 is a power of two:
    exact, and bit-identical to the host-side WAV decode's scaling) — the
    device half of the decoded-PCM cache path (data/dataset.py), which keeps
    the H2D copy at int16 width.  Float input passes through as float32."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (1.0 / 32768.0)
    return audio.astype(jnp.float32)


class FeaturePipeline:
    """Waveform (B, L) + lengths → features (B, T', input_size) + lengths.

    Instantiate once (precomputes window / mel / DCT matrices), then call as
    a jittable function — typically closed over inside the jitted train step
    or decode step.  `train=True` enables dither + SpecAugment and requires
    an rng key.
    """

    def __init__(self, cfg: FeatureConfig):
        self.cfg = cfg
        c = cfg
        if c.feature_type == 'logfbank':
            # FilterbankFeatures: hann periodic=False, slaney mel
            window = hann_window(c.win_length, periodic=False)
            self.mel = jnp.asarray(mel_filters(
                c.sample_rate, c.n_fft, c.feature_size,
                htk=False, norm='slaney'))
            self.dct = None
        else:
            # torchaudio Mel/MFCC: hann periodic=True, htk mel, no norm
            n_mels = c.feature_size if c.feature_type == 'melspec' \
                else c.mfcc_n_mels
            window = hann_window(c.win_length, periodic=True)
            self.mel = jnp.asarray(mel_filters(
                c.sample_rate, c.n_fft, n_mels, htk=True, norm=None))
            self.dct = (jnp.asarray(dct_matrix(c.feature_size, n_mels))
                        if c.feature_type == 'mfcc' else None)
        # zero-pad window to n_fft, centered (torch.stft convention)
        left = (c.n_fft - c.win_length) // 2
        self.window = jnp.asarray(np.pad(
            window, (left, c.n_fft - c.win_length - left)))

    def num_frames(self, num_samples):
        """Static frame count for a given waveform length."""
        t = 1 + num_samples // self.cfg.hop_length
        if self.cfg.downsample > 1:
            if self.cfg.pad_to_divisible:
                t = -(-t // self.cfg.downsample)
            else:
                t = t // self.cfg.downsample
        return t

    def __call__(self, audio, lengths, rng=None, train=False):
        c = self.cfg
        audio = pcm_to_float(audio)
        lengths = lengths.astype(jnp.int32)
        if train and rng is not None:
            rng_dither, rng_spec = jax.random.split(rng)
        else:
            rng_dither = rng_spec = None

        if c.feature_type == 'logfbank':
            if train and c.dither > 0:
                audio = audio + c.dither * jax.random.normal(
                    rng_dither, audio.shape)
            if c.preemph is not None:
                audio = preemphasis(audio, c.preemph)
        if _pallas_feat_eligible(c):
            # fused Pallas featurization kernel: frame+window+DFT+|·|²+mel
            # in one pass, no frame tensor in HBM (the north-star kernel)
            from edgedict_tpu.ops.features_pallas import mel_power_pallas
            feat = mel_power_pallas(audio, self.window, self.mel,
                                    c.n_fft, c.hop_length)
        else:
            spec = stft_power(audio, self.window, c.n_fft, c.hop_length)
            feat = jnp.einsum('btf,mf->btm', spec, self.mel,
                              preferred_element_type=jnp.float32)
        feat_len = jnp.ceil(lengths.astype(jnp.float32)
                            / c.hop_length).astype(jnp.int32)

        if c.feature_type == 'logfbank':
            feat = jnp.log(feat + LOG_GUARD)
            feat = normalize_batch(feat, feat_len, c.normalize)
            # zero beyond seq_len (rnnt/features.py:137-141)
            mask = jnp.arange(feat.shape[1])[None, :] < feat_len[:, None]
            feat = jnp.where(mask[..., None], feat, 0.0)
        elif c.feature_type == 'mfcc':
            feat = jnp.log(feat + MFCC_LOG_GUARD)
            feat = jnp.einsum('btm,mk->btk', feat, self.dct,
                              preferred_element_type=jnp.float32)

        if c.delta:
            d1 = compute_deltas(feat)
            d2 = compute_deltas(d1)
            feat = jnp.concatenate([feat, d1, d2], axis=-1)

        feat, feat_len = downsample_stack(feat, feat_len, c.downsample,
                                          c.pad_to_divisible)
        if train and (c.T_num_mask > 0 or c.F_num_mask > 0
                      or c.W_warp > 0):
            rng_warp, rng_spec = jax.random.split(rng_spec)
            if c.W_warp > 0:
                feat = time_warp(rng_warp, feat, c.W_warp)
            feat = spec_augment(rng_spec, feat, c.T_mask, c.T_num_mask,
                                c.F_mask, c.F_num_mask)
        return feat, feat_len


def build_transform(feature_type, feature_size, n_fft=512, win_length=400,
                    hop_length=200, delta=False, cmvn=False, downsample=1,
                    T_mask=0, T_num_mask=0, F_mask=0, F_num_mask=0,
                    pad_to_divisible=True):
    """Reference-compatible builder (rnnt/transforms.py:165-203): returns
    (train_pipeline, test_pipeline, input_size).  Both pipelines share the
    same FeaturePipeline; train applies dither + SpecAugment via the
    train=True call argument."""
    cfg = FeatureConfig(
        feature_type=feature_type, feature_size=feature_size, n_fft=n_fft,
        win_length=win_length, hop_length=hop_length, delta=delta,
        normalize='per_feature' if cmvn else 'none', downsample=downsample,
        pad_to_divisible=pad_to_divisible,
        T_mask=T_mask, T_num_mask=T_num_mask,
        F_mask=F_mask, F_num_mask=F_num_mask)
    pipeline = FeaturePipeline(cfg)

    def train_fn(audio, lengths, rng):
        return pipeline(audio, lengths, rng=rng, train=True)

    def test_fn(audio, lengths):
        return pipeline(audio, lengths, train=False)

    return train_fn, test_fn, cfg.input_size
