"""Fused Pallas audio-featurization kernel (the BASELINE.json north star).

Replaces the XLA frame-gather + jnp.fft.rfft + mel einsum front of the
log-mel pipeline (features.py stft_power, reference rnnt/features.py:
106-152) with ONE Pallas kernel per (batch row, 128-frame tile):

  * no (B, T, n_fft) frame tensor ever hits HBM (that gather alone cost
    1.26 ms at train scale).  Framing with hop h and window n_fft is
    decomposed into ceil(n_fft/h) hop-aligned shifted views of the audio,
    built outside with cheap slices; the window is folded into the DFT
    matrices, so the kernel is pure aligned matmuls:
        re = Σ_s  hops_s @ (window_s · DFTcos_s),   im likewise,
        mel_power = (re² + im²) @ melᵀ
  * the DFT runs on the MXU — on TPU a matmul real-DFT beats the XLA FFT.

The kernel emits mel POWER; log/normalize/downsample/SpecAugment stay in
XLA where they fuse into neighbours.  Off-TPU backends run interpret mode
in tests; production CPU uses the XLA path (features.py dispatch,
EDGEDICT_PALLAS_FEAT=0|force overrides).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME_TILE = 128


def _interpret():
    return jax.default_backend() != 'tpu'


def _split(x):
    """fp32 → (hi, lo) bf16 pair with hi + lo ≈ x to ~2⁻²¹ relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b_hi, b_lo):
    """3-pass bf16 matmul ≈ fp32: a@b = a_hi@b_hi + a_hi@b_lo + a_lo@b_hi
    (the lo·lo term is ~2⁻³² relative — below fp32 anyway).  Single-pass
    bf16 loses ~8 mantissa bits, which log() amplifies on near-silent mel
    bins (measured 3.7 max log diff); Mosaic exposes no 3-pass precision,
    so the split is done by hand.  Half the passes of HIGHEST."""
    a_hi, a_lo = _split(a)
    d = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return d


def _kernel(*refs, n_parts):
    # refs: hops_0..hops_{P-1}, dre_hi/lo (P, hop, F), dim_hi/lo,
    #       mel_hi/lo (F, M), out
    hop_refs = refs[:n_parts]
    (dre_hi_ref, dre_lo_ref, dim_hi_ref, dim_lo_ref,
     mel_hi_ref, mel_lo_ref, out_ref) = refs[n_parts:]
    n_freq = dre_hi_ref.shape[-1]
    ft = hop_refs[0].shape[1]
    re = jnp.zeros((ft, n_freq), jnp.float32)
    im = jnp.zeros((ft, n_freq), jnp.float32)
    for s in range(n_parts):
        h = hop_refs[s][0]                       # (FT, hop)
        re = re + _dot3(h, dre_hi_ref[s], dre_lo_ref[s])
        im = im + _dot3(h, dim_hi_ref[s], dim_lo_ref[s])
    power = re * re + im * im                    # (FT, n_freq)
    out_ref[0] = _dot3(power, mel_hi_ref[:, :], mel_lo_ref[:, :])


@functools.partial(jax.jit, static_argnums=(3, 4))
def mel_power_pallas(audio, window, mel_fb, n_fft, hop):
    """(B, L) waveform → (B, T, n_mels) mel power, T = 1 + L // hop
    (torch.stft center=True convention: reflect pad n_fft//2 per side).

    window: (n_fft,) analysis window (win_length zero-padded to n_fft);
    mel_fb: (n_mels, n_freq) filterbank.  All fp32.
    """
    B, L = audio.shape
    n_freq = n_fft // 2 + 1
    n_parts = -(-n_fft // hop)

    p = n_fft // 2
    audio_p = jnp.pad(audio.astype(jnp.float32), ((0, 0), (p, p)),
                      mode='reflect')
    T = 1 + L // hop
    n_tiles = -(-T // FRAME_TILE)
    th = n_tiles * FRAME_TILE
    need = th * hop + (n_parts - 1) * hop
    audio_p = jnp.pad(audio_p, ((0, 0), (0, need - audio_p.shape[1])))
    # shifted hop-aligned views: hops_s[b, i] = audio_p[b, (i+s)·hop : +hop]
    hops = [audio_p[:, s * hop:s * hop + th * hop].reshape(B, th, hop)
            for s in range(n_parts)]

    # window folded into the DFT matrices, zero-padded to n_parts·hop rows
    k = np.arange(n_fft)
    f = np.arange(n_freq)
    ang = -2.0 * np.pi * np.outer(k, f) / n_fft
    pad_rows = n_parts * hop - n_fft
    win = jnp.pad(window.astype(jnp.float32), (0, pad_rows))[:, None]
    base_re = jnp.asarray(np.pad(np.cos(ang), ((0, pad_rows), (0, 0))),
                          jnp.float32)
    base_im = jnp.asarray(np.pad(np.sin(ang), ((0, pad_rows), (0, 0))),
                          jnp.float32)
    dre = (base_re * win).reshape(n_parts, hop, n_freq)
    dim = (base_im * win).reshape(n_parts, hop, n_freq)
    dre_hi, dre_lo = _split(dre)
    dim_hi, dim_lo = _split(dim)
    mel_hi, mel_lo = _split(
        jnp.swapaxes(mel_fb, 0, 1).astype(jnp.float32))

    n_mels = mel_fb.shape[0]
    kernel = functools.partial(_kernel, n_parts=n_parts)
    hop_spec = pl.BlockSpec((1, FRAME_TILE, hop), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    fixed3 = lambda b, t: (0, 0, 0)
    fixed2 = lambda b, t: (0, 0)
    d_spec = pl.BlockSpec((n_parts, hop, n_freq), fixed3,
                          memory_space=pltpu.VMEM)
    mel_spec = pl.BlockSpec((n_freq, n_mels), fixed2,
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[hop_spec] * n_parts + [d_spec] * 4 + [mel_spec] * 2,
        out_specs=pl.BlockSpec((1, FRAME_TILE, n_mels),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, th, n_mels), jnp.float32),
        interpret=_interpret(),
    )(*hops, dre_hi, dre_lo, dim_hi, dim_lo, mel_hi, mel_lo)
    return out[:, :T]
