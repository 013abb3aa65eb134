"""wav2vec 2.0 self-supervised pretraining, TPU-native.

Rebuild of the reference pretraining stack:
  * FrontEnd causal-conv feature extractor (rnnt/models.py:313-365):
    CausalConv1d → stack of DilatedConvBlock (GELU → GroupNorm → conv,
    right-trim of the symmetric padding) → LayerNorm — exact reference
    geometry including its trim-after-stride convention, so pretrained
    torch checkpoints import 1:1.
  * Wav2Vec (rnnt/wav2vec.py:20-421): span masking with a learned mask
    embedding, Gumbel-VQ (or plain projection) targets from the unmasked
    features, within-utterance negative sampling, cosine-similarity logits
    over [positive; negatives] / temperature.
  * GumbelVectorQuantizer (modules/softmax_vector_quantizer.py:11-201) and
    KmeansVectorQuantizer (modules/kmeans_vector_quantizer.py:11-125).
  * ConstrastiveCriterion (rnnt/wav2vec.py:424-528): InfoNCE
    cross-entropy + weighted perplexity/feature penalties.

TPU-first reshaping of the computation:
  * Span masks are PLANNED on the host (`compute_mask_indices`, the numpy
    fairseq sampler from rnnt/data_utils.py:348-471) which already
    equalizes the mask count per row — the jitted step then consumes a
    dense (B, M) index tensor: every gather/scatter is static-shape.
  * Negative sampling runs inside the jit with explicit PRNG keys
    (reference used torch.randint device RNG).
  * The straight-through estimators are `jax.lax.stop_gradient` algebra.
"""

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.models import transducer as T
from edgedict_tpu.ops.layers import (
    group_norm, group_norm_init, layer_norm, layer_norm_init, linear,
    linear_init)


# ---------------------------------------------------------------------------
# host-side span mask planning (numpy — fairseq compute_mask_indices port)
# ---------------------------------------------------------------------------

def compute_mask_indices(shape, padding_mask, mask_prob, mask_length,
                         mask_type='static', mask_other=0.0, min_masks=0,
                         no_overlap=False, min_space=0, rng=None):
    """Sample span masks → bool (B, T).  Same policy surface as the
    reference (rnnt/data_utils.py:348-471): expected `mask_prob * T /
    mask_length` spans per row, span length static/uniform/normal/poisson,
    counts equalized across rows (each row ends with the SAME number of
    masked steps — the property the fixed-shape TPU gather relies on).

    PROVENANCE: this function is a line-faithful port of fairseq's
    `compute_mask_indices` (MIT license, facebookresearch/fairseq
    fairseq/data/data_utils.py — the reference vendors the same code at
    rnnt/data_utils.py:348-471).  Kept structurally identical ON PURPOSE:
    wav2vec pretraining quality is sensitive to the exact mask statistics
    (span-count rounding, the no-overlap recursive packing, the per-row
    count equalization via random subsampling), and bit-identical sampling
    under a seeded RNG is what the pretraining parity tests pin against
    the torch oracle.  This is host-side batch planning, not TPU code —
    the device consumes only the resulting dense bool mask."""
    rng = rng or np.random
    bsz, all_sz = shape
    mask = np.full((bsz, all_sz), False)

    all_num_mask = int(mask_prob * all_sz / float(mask_length)
                       + rng.random())
    all_num_mask = max(min_masks, all_num_mask)

    mask_idcs = []
    for i in range(bsz):
        if padding_mask is not None:
            sz = all_sz - int(padding_mask[i].sum())
            num_mask = int(mask_prob * sz / float(mask_length)
                           + rng.random())
            num_mask = max(min_masks, num_mask)
        else:
            sz = all_sz
            num_mask = all_num_mask

        if mask_type == 'static':
            lengths = np.full(num_mask, mask_length)
        elif mask_type == 'uniform':
            lengths = rng.randint(mask_other, mask_length * 2 + 1,
                                  size=num_mask)
        elif mask_type == 'normal':
            lengths = rng.normal(mask_length, mask_other, size=num_mask)
            lengths = np.maximum(1, np.round(lengths)).astype(int)
        elif mask_type == 'poisson':
            lengths = rng.poisson(mask_length, size=num_mask)
            lengths = np.round(lengths).astype(int)
        else:
            raise ValueError(f'unknown mask selection {mask_type}')

        if sum(lengths) == 0:
            lengths[0] = min(mask_length, sz - 1)

        if no_overlap:
            mask_idc = []

            def arrange(s, e, length, keep_length):
                span_start = rng.randint(s, e - length)
                mask_idc.extend(span_start + j for j in range(length))
                new_parts = []
                if span_start - s - min_space >= keep_length:
                    new_parts.append((s, span_start - min_space + 1))
                if e - span_start - length - min_space > keep_length:
                    new_parts.append((span_start + length + min_space, e))
                return new_parts

            parts = [(0, sz)]
            min_length = min(lengths)
            for length in sorted(lengths, reverse=True):
                lens = np.fromiter(
                    (e - s if e - s >= length + min_space else 0
                     for s, e in parts), np.int_)
                l_sum = np.sum(lens)
                if l_sum == 0:
                    break
                probs = lens / l_sum
                c = rng.choice(len(parts), p=probs)
                s, e = parts.pop(c)
                parts.extend(arrange(s, e, length, min_length))
            mask_idc = np.asarray(mask_idc)
        else:
            min_len = min(lengths)
            if sz - min_len <= num_mask:
                min_len = sz - num_mask - 1
            mask_idc = rng.choice(sz - min_len, num_mask, replace=False)
            mask_idc = np.asarray([
                mask_idc[j] + offset
                for j in range(len(mask_idc))
                for offset in range(lengths[j])])
        mask_idcs.append(np.unique(mask_idc[mask_idc < sz]))

    min_len = min(len(m) for m in mask_idcs)
    for i, mask_idc in enumerate(mask_idcs):
        if len(mask_idc) > min_len:
            mask_idc = rng.choice(mask_idc, min_len, replace=False)
        mask[i, mask_idc] = True
    return mask


def mask_to_dense_indices(mask):
    """bool (B, T) with equal per-row counts → int32 (B, M) positions."""
    counts = mask.sum(axis=1)
    m = int(counts.min()) if len(counts) else 0
    idx = np.zeros((mask.shape[0], m), np.int32)
    for i in range(mask.shape[0]):
        idx[i] = np.flatnonzero(mask[i])[:m]
    return idx


# ---------------------------------------------------------------------------
# FrontEnd conv stack
# ---------------------------------------------------------------------------

DEFAULT_FRONTEND = ((10, 5, 16), (8, 4, 32), (4, 2, 128), (4, 2, 128),
                    (4, 2, 128))


def _kaiming_conv(key, out_ch, in_ch, k):
    fan_in = in_ch * k
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (out_ch, in_ch, k), jnp.float32) * std


def frontend_init(key, params_spec=DEFAULT_FRONTEND, bias=True):
    keys = jax.random.split(key, len(params_spec) * 2)
    layers = []
    in_ch = 1
    for i, (k, s, c) in enumerate(params_spec):
        layer = {'w': _kaiming_conv(keys[2 * i], c, in_ch, k)}
        if bias:
            bound = 1.0 / math.sqrt(in_ch * k)
            layer['b'] = jax.random.uniform(
                keys[2 * i + 1], (c,), jnp.float32, -bound, bound)
        if i > 0:
            layer['gn'] = group_norm_init(in_ch)
        layers.append(layer)
        in_ch = c
    return {'layers': layers,
            'ln': layer_norm_init(params_spec[-1][2])}


def _conv1d(x, w, b, stride, pad):
    """x (B, C_in, T) → (B, C_out, T'), symmetric padding `pad`."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b[None, :, None]
    return y


def frontend_apply(params, xs, params_spec=DEFAULT_FRONTEND):
    """Raw waveform (B, L) → features (B, T, C_last).

    Exact reference geometry (rnnt/models.py:313-365): each conv pads
    (k−1)·dilation on BOTH sides then trims that many elements from the END
    of the output; blocks ≥ 1 apply GELU → GroupNorm(1) → conv."""
    x = xs.astype(jnp.float32)[:, None, :]          # (B, 1, L)
    for i, ((k, s, c), layer) in enumerate(zip(params_spec,
                                               params['layers'])):
        pad = k - 1
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)  # torch exact-erf GELU
            x = group_norm(layer['gn'], x, num_groups=1)
        x = _conv1d(x, layer['w'], layer.get('b'), s, pad)
        x = x[:, :, :-pad]
    x = jnp.swapaxes(x, 1, 2)                       # (B, T, C)
    return layer_norm(params['ln'], x)


def frontend_output_length(params_spec, n_samples):
    """Output frame count for a given input length (conv arithmetic with
    the reference's pad-both/trim-end convention)."""
    t = n_samples
    for (k, s, _) in params_spec:
        pad = k - 1
        t = (t + 2 * pad - k) // s + 1 - pad
    return t


# ---------------------------------------------------------------------------
# fairseq-style conv extractor (reference ConvFeatureExtractionModel,
# rnnt/models.py:383-461 — defined in the reference but unused by its
# trainers; provided here for the same surface)
# ---------------------------------------------------------------------------

def conv_feature_extractor_init(key, conv_layers, mode='default',
                                bias=False):
    """conv_layers: [(dim, kernel, stride), ...].  mode 'default' puts a
    GroupNorm after the first conv; 'layer_norm' one LayerNorm per block."""
    assert mode in ('default', 'layer_norm')
    keys = jax.random.split(key, len(conv_layers) * 2)
    layers = []
    in_ch = 1
    for i, (dim, k, _) in enumerate(conv_layers):
        layer = {'w': _kaiming_conv(keys[2 * i], dim, in_ch, k)}
        if bias:
            bound = 1.0 / math.sqrt(in_ch * k)
            layer['b'] = jax.random.uniform(
                keys[2 * i + 1], (dim,), jnp.float32, -bound, bound)
        if mode == 'default' and i == 0:
            layer['gn'] = group_norm_init(dim)
        elif mode == 'layer_norm':
            layer['ln'] = layer_norm_init(dim)
        layers.append(layer)
        in_ch = dim
    return {'layers': layers}


def conv_feature_extractor_apply(params, conv_layers, xs, mode='default'):
    """(B, L) waveform → (B, T, C): valid (un-padded) convolutions with
    GELU, norm placement per mode (fp32 GroupNorm — the reference's
    Fp32GroupNorm, modules/group_norm.py:5-17)."""
    x = xs.astype(jnp.float32)[:, None, :]
    for (dim, k, s), layer in zip(conv_layers, params['layers']):
        x = _conv1d(x, layer['w'], layer.get('b'), s, pad=0)
        if 'gn' in layer:
            x = group_norm(layer['gn'], x, num_groups=dim)
        if 'ln' in layer:
            xt = jnp.swapaxes(x, 1, 2)
            x = jnp.swapaxes(layer_norm(layer['ln'], xt), 1, 2)
        x = jax.nn.gelu(x, approximate=False)
    return jnp.swapaxes(x, 1, 2)


# ---------------------------------------------------------------------------
# vector quantizers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GumbelVQConfig:
    dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 256
    temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    combine_groups: bool = False


def gumbel_vq_init(key, cfg: GumbelVQConfig):
    k1, k2 = jax.random.split(key)
    n_groups = 1 if cfg.combine_groups else cfg.groups
    var_dim = cfg.vq_dim // cfg.groups
    # reference init: vars ~ U(0,1)-ish normal? fairseq uses uniform init
    codebook = jax.random.uniform(
        k1, (1, n_groups * cfg.num_vars, var_dim), jnp.float32)
    return {
        'vars': codebook,
        'weight_proj': linear_init(k2, cfg.dim, cfg.groups * cfg.num_vars),
    }


def gumbel_vq_temp(cfg: GumbelVQConfig, num_updates):
    start, end, decay = cfg.temp
    return max(start * decay ** num_updates, end)


def gumbel_vq_apply(params, cfg: GumbelVQConfig, x, temp, rng=None,
                    training=True, produce_targets=False):
    """x (B, T, dim) → dict(x (B,T,vq_dim), code_perplexity,
    prob_perplexity, targets?) — Gumbel-softmax VQ with straight-through
    hard selection in training (modules/softmax_vector_quantizer.py)."""
    b, t, _ = x.shape
    logits = linear(params['weight_proj'], x)        # (B, T, G*V)
    logits = logits.reshape(b * t * cfg.groups, cfg.num_vars)

    hard_idx = jnp.argmax(logits, axis=-1)
    hard = jax.nn.one_hot(hard_idx, cfg.num_vars, dtype=logits.dtype)

    # code perplexity: exp entropy of the hard codeword usage per group
    hard_probs = jnp.mean(
        hard.reshape(b * t, cfg.groups, cfg.num_vars), axis=0)
    code_ppl = jnp.sum(jnp.exp(
        -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)))
    soft = jax.nn.softmax(
        logits.reshape(b * t, cfg.groups, cfg.num_vars).astype(jnp.float32),
        axis=-1)
    avg_probs = jnp.mean(soft, axis=0)
    prob_ppl = jnp.sum(jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)))

    if training and rng is not None:
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logits.shape) + 1e-10) + 1e-10)
        y_soft = jax.nn.softmax((logits + g) / temp, axis=-1)
        y_hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1), cfg.num_vars,
                                dtype=y_soft.dtype)
        sel = y_soft + jax.lax.stop_gradient(y_hard - y_soft)  # ST
    else:
        sel = hard

    n_groups = 1 if cfg.combine_groups else cfg.groups
    codebook = params['vars']
    if cfg.combine_groups:
        codebook = jnp.tile(codebook, (1, cfg.groups, 1))
    sel = sel.reshape(b * t, cfg.groups * cfg.num_vars)[..., None]
    quantized = (sel * codebook).reshape(
        b * t, cfg.groups, cfg.num_vars, -1).sum(axis=-2)
    quantized = quantized.reshape(b, t, -1)

    out = {'x': quantized, 'num_vars': cfg.num_vars * cfg.groups,
           'code_perplexity': code_ppl, 'prob_perplexity': prob_ppl,
           'temp': temp}
    if produce_targets:
        out['targets'] = hard_idx.reshape(b, t, cfg.groups)
    return out


@dataclasses.dataclass(frozen=True)
class KmeansVQConfig:
    dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 256
    gamma: float = 0.25     # commitment weight


def kmeans_vq_init(key, cfg: KmeansVQConfig):
    k1, k2 = jax.random.split(key)
    var_dim = cfg.vq_dim // cfg.groups
    embedding = jax.random.normal(
        k1, (cfg.num_vars, cfg.groups, var_dim), jnp.float32) \
        * (1.0 / math.sqrt(var_dim))
    # grouped 1x1 conv projection dim → vq_dim
    proj = jax.random.normal(
        k2, (cfg.groups, cfg.dim // cfg.groups, var_dim), jnp.float32) \
        * math.sqrt(2.0 / cfg.dim)
    return {'embedding': embedding, 'proj': proj,
            'gn': group_norm_init(cfg.vq_dim)}


def kmeans_vq_apply(params, cfg: KmeansVQConfig, x,
                    produce_targets=False):
    """Straight-through k-means VQ (modules/kmeans_vector_quantizer.py):
    grouped projection + Fp32GroupNorm → nearest codeword per group →
    `_pass_grad` STE; returns latent+commitment MSE as kmeans_loss."""
    b, t, _ = x.shape
    var_dim = cfg.vq_dim // cfg.groups
    xg = x.reshape(b, t, cfg.groups, cfg.dim // cfg.groups)
    ze = jnp.einsum('btgd,gdv->btgv', xg, params['proj'],
                    preferred_element_type=jnp.float32)
    zf = ze.reshape(b, t, cfg.vq_dim).swapaxes(1, 2)  # (B, vq, T)
    zf = group_norm(params['gn'], zf, num_groups=cfg.groups)
    ze = zf.swapaxes(1, 2).reshape(b, t, cfg.groups, var_dim)

    d = jnp.sum(
        (ze[:, :, :, None, :]
         - params['embedding'].transpose(1, 0, 2)[None, None]) ** 2,
        axis=-1)                                     # (B, T, G, V)
    idx = jnp.argmin(d, axis=-1)
    zq = jnp.take_along_axis(
        params['embedding'].transpose(1, 0, 2)[None, None],
        idx[..., None, None], axis=3)[:, :, :, 0, :]

    # straight-through: forward zq, gradient to ze
    out_q = ze + jax.lax.stop_gradient(zq - ze)
    latent_loss = jnp.mean((jax.lax.stop_gradient(ze) - zq) ** 2)
    commit_loss = jnp.mean((ze - jax.lax.stop_gradient(zq)) ** 2)
    kmeans_loss = latent_loss + cfg.gamma * commit_loss

    hard = jax.nn.one_hot(idx.reshape(-1, cfg.groups), cfg.num_vars)
    hard_probs = jnp.mean(hard, axis=0)
    code_ppl = jnp.sum(jnp.exp(
        -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)))

    out = {'x': out_q.reshape(b, t, cfg.vq_dim),
           'kmeans_loss': kmeans_loss, 'code_perplexity': code_ppl,
           'num_vars': cfg.num_vars * cfg.groups}
    if produce_targets:
        out['targets'] = idx
    return out


# ---------------------------------------------------------------------------
# Wav2Vec model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Wav2VecConfig:
    frontend_params: Tuple = DEFAULT_FRONTEND
    front_bias: bool = False
    input_size: int = 768
    enc_hidden_size: int = 768
    enc_layers: int = 7
    enc_dropout: float = 0.1
    enc_proj_size: int = 512
    module_type: str = 'LSTM'
    mask_prob: float = 0.15
    mask_length: int = 10
    mask_selection: str = 'static'
    num_negatives: int = 100
    final_dim: int = 0
    latent_groups: int = 2
    latent_vars: int = 320
    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    logit_temp: float = 0.1
    quantize_targets: bool = True
    # optional branches (reference rnnt/wav2vec.py:115-145,332-358 — dead
    # config at its call site, cli/pretrain_wav2vec.py:122-136, but part
    # of the model surface)
    quantize_input: bool = False
    same_quantizer: bool = False          # input VQ shares the target VQ
    negatives_from_everywhere: bool = False
    cross_sample_negatives: int = 0
    codebook_negatives: int = 0

    @property
    def embed(self):
        return self.frontend_params[-1][2]

    @property
    def final_dim_(self):
        return self.final_dim if self.final_dim > 0 else self.input_size

    @property
    def encoder_cfg(self):
        return T.TransducerConfig(
            vocab_size=1, input_size=self.input_size,
            enc_hidden_size=self.enc_hidden_size,
            enc_layers=self.enc_layers, enc_dropout=self.enc_dropout,
            enc_proj_size=self.enc_proj_size,
            enc_time_reductions=(),      # no time reduction in pretraining
            module_type=self.module_type)

    @property
    def gumbel_cfg(self):
        return GumbelVQConfig(
            dim=self.embed, num_vars=self.latent_vars,
            groups=self.latent_groups, vq_dim=self.final_dim_,
            temp=self.latent_temp)

    @property
    def input_vq_cfg(self):
        """Input-VQ geometry (reference rnnt/wav2vec.py:139-154: dim =
        frontend embed, vq_dim = encoder embed dim when not sharing the
        target quantizer)."""
        return GumbelVQConfig(
            dim=self.embed, num_vars=self.latent_vars,
            groups=self.latent_groups, vq_dim=self.input_size,
            temp=self.latent_temp)


def wav2vec_init(key, cfg: Wav2VecConfig):
    keys = jax.random.split(key, 9)
    params = {
        'frontend': frontend_init(keys[0], cfg.frontend_params,
                                  bias=cfg.front_bias),
        'encoder': T.encoder_init(keys[1], cfg.encoder_cfg),
        'mask_emb': jax.random.uniform(keys[2], (cfg.input_size,),
                                       jnp.float32),
        'final_proj': linear_init(keys[3], cfg.enc_proj_size,
                                  cfg.final_dim_),
    }
    # reference condition (rnnt/wav2vec.py:98-102): the post-extract proj
    # exists only when dims differ AND input is not quantized (the input
    # VQ's project_inp takes over the dim change)
    if cfg.embed != cfg.input_size and not cfg.quantize_input:
        params['post_extract_proj'] = linear_init(
            keys[4], cfg.embed, cfg.input_size)
    if cfg.quantize_targets:
        params['quantizer'] = gumbel_vq_init(keys[5], cfg.gumbel_cfg)
        params['project_q'] = linear_init(keys[6], cfg.final_dim_,
                                          cfg.final_dim_)
    else:
        params['project_q'] = linear_init(keys[6], cfg.embed,
                                          cfg.final_dim_)
    if cfg.quantize_input:
        if cfg.same_quantizer and 'quantizer' in params:
            # shared codebook: project from the TARGET quantizer's vq_dim
            params['project_inp'] = linear_init(
                keys[7], cfg.final_dim_, cfg.input_size)
        else:
            params['input_quantizer'] = gumbel_vq_init(
                keys[8], cfg.input_vq_cfg)
            params['project_inp'] = linear_init(
                keys[7], cfg.input_vq_cfg.vq_dim, cfg.input_size)
    return params


def sample_negative_indices(rng, b, m, n_negatives):
    """Within-utterance negatives: for each of the M target steps, sample
    n_negatives positions in [0, M−1) and skip self (reference
    sample_negatives, rnnt/wav2vec.py:205-263)."""
    tszs = jnp.repeat(jnp.arange(m), n_negatives)[None, :]
    neg_idxs = jax.random.randint(rng, (b, n_negatives * m), 0, m - 1)
    neg_idxs = jnp.where(neg_idxs >= tszs, neg_idxs + 1, neg_idxs)
    return neg_idxs       # (B, n_negatives * M), values in [0, M)


def sample_negatives(rng, y, num, n_negatives, cross_sample_negatives=0):
    """Full reference sample_negatives (rnnt/wav2vec.py:205-263): gather
    `n_negatives` within-utterance candidates (from this row's Tsz
    positions, self-index skipped) and `cross_sample_negatives` candidates
    from the whole flattened (B*Tsz) pool, for each of the `num` target
    steps.  y: (B, Tsz, F) candidate features (Tsz may differ from num
    when negatives_from_everywhere samples the full unmasked sequence).
    Returns (n_negatives + cross_sample_negatives, B, num, F)."""
    b, tsz, fsz = y.shape
    if n_negatives == 0 and cross_sample_negatives == 0:
        # codebook-only negatives: no sampled negatives at all (the
        # reference returns an empty tensor here, rnnt/wav2vec.py:208-209)
        return jnp.zeros((0, b, num, fsz), y.dtype)
    rng_w, rng_x = jax.random.split(rng)
    parts = []
    if n_negatives > 0:
        tszs = jnp.repeat(jnp.arange(num), n_negatives)[None, :]
        idx = jax.random.randint(rng_w, (b, n_negatives * num), 0, tsz - 1)
        idx = jnp.where(idx >= tszs, idx + 1, idx)
        parts.append(idx + jnp.arange(b)[:, None] * tsz)  # row-local pool
    if cross_sample_negatives > 0:
        tszs = jnp.repeat(jnp.arange(num),
                          cross_sample_negatives)[None, :]
        idx = jax.random.randint(rng_x, (b, cross_sample_negatives * num),
                                 0, b * tsz - 1)
        idx = jnp.where(idx >= tszs, idx + 1, idx)
        parts.append(idx)                                  # global pool
    neg_idxs = jnp.concatenate(parts, axis=1)
    negs = y.reshape(b * tsz, fsz)[neg_idxs.reshape(-1)]
    n_total = n_negatives + cross_sample_negatives
    # the reference reshapes the concatenated index block directly
    # (rnnt/wav2vec.py:256-260) — reproduced verbatim for parity
    return jnp.moveaxis(negs.reshape(b, num, n_total, fsz), 2, 0)


def gumbel_vq_sample_codebook(params, cfg: GumbelVQConfig, rng, b, n):
    """Sample `n` random full codewords (all groups concatenated) per each
    of `b` targets (reference GumbelVectorQuantizer.sample_from_codebook,
    modules/softmax_vector_quantizer.py:116-127).  Returns (b, n, vq_dim)."""
    codebook = params['vars'][0]                 # (G*V, var_dim)
    if cfg.combine_groups:
        codebook = jnp.tile(codebook, (cfg.groups, 1))
    idx = jax.random.randint(rng, (b * n, cfg.groups), 0, cfg.num_vars)
    idx = idx + jnp.arange(cfg.groups)[None, :] * cfg.num_vars
    z = codebook[idx.reshape(-1)].reshape(b * n, cfg.groups, -1)
    return z.reshape(b, n, -1)


def wav2vec_forward(params, cfg: Wav2VecConfig, source, mask_idx,
                    temp=0.5, rng=None, training=True):
    """Pretraining forward.

    Args:
      source: (B, L) raw waveform.
      mask_idx: (B, M) int32 masked frame positions (host-planned,
        equal count per row).
      temp: current Gumbel temperature (host-annealed scalar).
    Returns dict with 'logits' (1+N, B, M), 'features_pen',
      'prob_perplexity', 'code_perplexity', 'num_vars'.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng_g, rng_n, rng_d, rng_iq, rng_ne, rng_cb = jax.random.split(rng, 6)

    features = frontend_apply(params['frontend'], source,
                              cfg.frontend_params)       # (B, T, embed)
    features_pen = jnp.mean(features.astype(jnp.float32) ** 2)
    unmasked = features

    if 'post_extract_proj' in params:
        features = linear(params['post_extract_proj'], features)

    out = {'features_pen': features_pen}
    if cfg.quantize_input:
        # quantize the ENCODER INPUT features over the full sequence
        # (reference rnnt/wav2vec.py:296-302); targets keep the raw
        # unmasked frontend output
        if 'input_quantizer' in params:
            q_in = gumbel_vq_apply(params['input_quantizer'],
                                   cfg.input_vq_cfg, features, temp,
                                   rng=rng_iq, training=training)
        else:      # same_quantizer: shares the target VQ's codebook
            q_in = gumbel_vq_apply(params['quantizer'], cfg.gumbel_cfg,
                                   features, temp, rng=rng_iq,
                                   training=training)
        features = linear(params['project_inp'], q_in['x'])
        # observable separately; the shared keys below follow the
        # reference's overwrite order (target VQ wins when present)
        out.update(input_prob_perplexity=q_in['prob_perplexity'],
                   input_code_perplexity=q_in['code_perplexity'])
        if not cfg.quantize_targets:
            out.update(prob_perplexity=q_in['prob_perplexity'],
                       code_perplexity=q_in['code_perplexity'],
                       num_vars=q_in['num_vars'], temp=temp)

    b, t, _ = features.shape
    m = mask_idx.shape[1]

    # scatter the learned mask embedding at masked positions
    onehot = jax.nn.one_hot(mask_idx, t, dtype=features.dtype)  # (B, M, T)
    is_masked = jnp.clip(onehot.sum(axis=1), 0, 1)[..., None]   # (B, T, 1)
    x = features * (1 - is_masked) + is_masked * params['mask_emb']

    h, _ = T.encoder_apply(params['encoder'], cfg.encoder_cfg, x,
                           deterministic=not training, rng=rng_d)

    # targets from the UNMASKED features at the masked positions
    y_feats = jnp.take_along_axis(
        unmasked, mask_idx[..., None].astype(jnp.int32), axis=1)  # (B,M,E)

    if cfg.quantize_targets:
        q = gumbel_vq_apply(params['quantizer'], cfg.gumbel_cfg, y_feats,
                            temp, rng=rng_g, training=training,
                            produce_targets=not training)
        y = linear(params['project_q'], q['x'])
        out.update(prob_perplexity=q['prob_perplexity'],
                   code_perplexity=q['code_perplexity'],
                   num_vars=q['num_vars'], temp=temp)
        if 'targets' in q:
            out['targets'] = q['targets']
        if cfg.negatives_from_everywhere:
            # candidates = the QUANTIZED full unmasked sequence, projected
            # after sampling (reference rnnt/wav2vec.py:332-337)
            neg_cands = gumbel_vq_apply(
                params['quantizer'], cfg.gumbel_cfg, unmasked, temp,
                rng=rng_ne, training=training)['x']
            negs = sample_negatives(rng_n, neg_cands, m,
                                    cfg.num_negatives,
                                    cfg.cross_sample_negatives)
            negs = linear(params['project_q'], negs)
        else:
            negs = sample_negatives(rng_n, y, m, cfg.num_negatives,
                                    cfg.cross_sample_negatives)
        if cfg.codebook_negatives > 0:
            # extra negatives drawn uniformly from the codebook
            # (reference rnnt/wav2vec.py:339-347)
            cb = gumbel_vq_sample_codebook(
                params['quantizer'], cfg.gumbel_cfg, rng_cb, b * m,
                cfg.codebook_negatives)
            cb = jnp.moveaxis(cb.reshape(b, m, cfg.codebook_negatives, -1),
                              2, 0)                   # (K, B, M, vq)
            cb = linear(params['project_q'], cb)
            negs = jnp.concatenate([negs, cb], axis=0)
    else:
        y = linear(params['project_q'], y_feats)
        if cfg.negatives_from_everywhere:
            negs = sample_negatives(rng_n, unmasked, m,
                                    cfg.num_negatives,
                                    cfg.cross_sample_negatives)
            negs = linear(params['project_q'], negs)
        else:
            negs = sample_negatives(rng_n, y, m, cfg.num_negatives,
                                    cfg.cross_sample_negatives)

    x_m = jnp.take_along_axis(h, mask_idx[..., None].astype(jnp.int32),
                              axis=1)                # (B, M, P)
    x_m = linear(params['final_proj'], x_m)          # (B, M, F)

    # cosine similarity logits over [positive; negatives] / temperature
    targets = jnp.concatenate([y[None], negs], axis=0)  # (1+N, B, M, F)
    x32 = x_m.astype(jnp.float32)
    t32 = targets.astype(jnp.float32)
    cos = jnp.sum(x32[None] * t32, axis=-1) / (
        jnp.linalg.norm(x32, axis=-1)[None]
        * jnp.linalg.norm(t32, axis=-1) + 1e-8)
    logits = cos / cfg.logit_temp                    # (1+N, B, M)

    neg_is_pos = jnp.all(jnp.isclose(y[None], negs), axis=-1)  # (N, B, M)
    logits = jnp.concatenate(
        [logits[:1],
         jnp.where(neg_is_pos, -jnp.inf, logits[1:])], axis=0)
    out['logits'] = logits
    return out


def contrastive_loss(result, prob_ppl_weight=0.1, features_pen_weight=10.0,
                     infonce=True):
    """InfoNCE cross-entropy (target class 0 = the positive) + weighted
    extra losses (reference ConstrastiveCriterion, rnnt/wav2vec.py:424-528).
    Returns (loss, metrics).

    infonce=False selects the BCE mode (reference rnnt/wav2vec.py:463-470).
    NOTE the reference's own BCE branch cannot run as written: its
    get_targets (rnnt/wav2vec.py:403-405) returns a (B*M,) zero vector
    that does not broadcast against the (M*B, 1+N) logits — dead config
    at its call site (cli/pretrain_wav2vec.py:136 passes infonce=True).
    Implemented here with the fairseq wav2vec-1.0 semantics the code
    descends from: binary target 1 for the positive row, 0 for negatives,
    elementwise BCE-with-logits; −inf logits on excluded (duplicate)
    negatives contribute exactly 0."""
    logits = result['logits']                        # (1+N, B, M)
    n1, b, m = logits.shape
    if infonce:
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=0)
        nll = -lsm[0]                                # (B, M)
        loss = jnp.sum(nll) / (b * m)
    else:
        x = logits.astype(jnp.float32)
        pos = jax.nn.softplus(-x[0])                 # target 1 on row 0
        neg = jax.nn.softplus(x[1:])                 # target 0 on the rest
        neg = jnp.where(jnp.isneginf(x[1:]), 0.0, neg)
        loss = (jnp.sum(pos) + jnp.sum(neg)) / (b * m)

    metrics = {'contrastive_loss': loss}
    extra = 0.0
    if 'prob_perplexity' in result:
        ppl_loss = (result['num_vars'] - result['prob_perplexity']) \
            / result['num_vars']
        extra = extra + prob_ppl_weight * ppl_loss
        metrics['prob_perplexity'] = result['prob_perplexity']
        metrics['code_perplexity'] = result['code_perplexity']
    extra = extra + features_pen_weight * result['features_pen']
    metrics['features_pen'] = result['features_pen']

    pred = jnp.argmax(logits, axis=0)
    # count ties at max as incorrect only when a negative achieves the max
    maxes = jnp.max(logits, axis=0)
    correct = jnp.sum((pred == 0) &
                      (jnp.sum(logits == maxes[None], axis=0) == 1))
    metrics['correct'] = correct
    metrics['count'] = b * m
    total = loss + extra
    metrics['loss'] = total
    return total, metrics
