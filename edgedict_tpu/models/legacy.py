"""Legacy v1 model family — TPU-native rebuild.

The reference keeps a pre-`rnnt/` generation alive at its top level:
`models.py` (RNNModel, legacy Transducer with a fast-tanh joint, LMModel),
`recurrent.py` (StackedRecurrent / ResidualRNNModel / ResidualProjModel
encoders, MFCC_ featurizer with sliding-window CMVN, NormalizationLayer,
ConcatFeature).  Round 1 skipped it as dead code; this module closes the
inventory row (SURVEY.md §2.7 "Legacy v1 models") with a functional JAX
re-design that shares the repo's scan/Pallas recurrences and decoding
machinery instead of translating the torch module soup.

Semantics notes (behavior pinned by tests/test_legacy.py):

* fast_tanh(x) = x / (1 + |x|) — the v1 joint nonlinearity
  (reference models.py:10-11, recurrent.py:15-23).
* StackedRecurrent (reference recurrent.py:238-279): residual LSTM stack
  with interleaved LayerNorms and an optional ×2 TimeReduction fired at
  module index 4 when `merge_first`.  The reference's module-index branch
  is latently broken for num_layers ≥ 3 (the reduction lands on a
  LayerNorm, which is then called with a hidden-state argument and raises)
  — we implement the evident INTENT: reduce once before a configurable
  layer (`reduce_before_layer`), residual-add whenever dims match,
  LayerNorm after every layer except the first.
* RNNModel (reference models.py:13-44): BatchNorm over the feature axis →
  multi-layer LSTM → Linear vocab head; CTC-style decoding.  The
  reference's `beam_search` calls an UNDEFINED `ctc_beam` symbol
  (models.py:44 — it crashes); here `ctc_prefix_beam_search` is a real
  CTC prefix beam search, oracle-tested.
* Legacy Transducer (reference models.py:46-117): ResidualRNNModel
  encoder, Embedding(padding_idx=1=BOS), plain multi-layer LSTM
  prediction net (no projection), joint = fc2(fast_tanh(fc1(cat(f, g)))).
  Greedy decode gates per-row state advancement exactly like v2
  (max one emission per frame).
* MFCC_ (reference recurrent.py:42-135): DB-scaled mel spectrogram
  (10·log10, top_db=80 clamp relative to the per-clip max) → DCT-II, with
  optional speechpy-style sliding-window CMVN (`cmvn_sliding`, win 201).
* ConcatFeature ≡ features.downsample_stack; NormalizationLayer is
  `instance_norm` below.

The v1 token-id scheme (<blank>=0, <bos>=1, <unk>=2, chars from 4 —
reference modules/tokenizer.py:39-48) lives in
`tokenizer.LegacyCharTokenizer`; the bundled BPE-1024 cache already loads
through `tokenizer.CharBPE`'s v1 auto-detection.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from edgedict_tpu.ops import rnn
from edgedict_tpu.ops.layers import (
    embedding, embedding_init, layer_norm, layer_norm_init, linear,
    linear_init)

BLANK = 0
BOS = 1   # v1 scheme: <bos>=1 doubles as the padding index


def fast_tanh(x):
    """x / (1 + |x|) — cheaper squashing than tanh (reference models.py:10)."""
    return x / (1.0 + jnp.abs(x))


# ---------------------------------------------------------------------------
# Normalization layers


def batch_norm_init(num_features):
    """torch nn.BatchNorm1d parameter/stat layout."""
    return {'gamma': jnp.ones((num_features,), jnp.float32),
            'beta': jnp.zeros((num_features,), jnp.float32),
            'mean': jnp.zeros((num_features,), jnp.float32),
            'var': jnp.ones((num_features,), jnp.float32)}


def batch_norm(params, x, train=False, momentum=0.1, eps=1e-5):
    """Feature-axis batch norm on (B, T, F) (the reference permutes to
    (B, F, T) for nn.BatchNorm1d — same statistics, reference
    models.py:28-30).

    Eval mode normalizes with the stored running stats.  Train mode uses
    batch statistics and returns (y, updated_params); stats update happens
    functionally (caller threads the new params), replacing torch's
    in-place running-stat mutation.
    """
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1))
        var = jnp.var(x32, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new = dict(params)
        new['mean'] = (1 - momentum) * params['mean'] + momentum * mean
        new['var'] = (1 - momentum) * params['var'] + momentum * unbiased
    else:
        mean, var, new = params['mean'], params['var'], params
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * params['gamma'] \
        + params['beta']
    return y.astype(x.dtype), new


def instance_norm(x, eps=1e-5):
    """Per-sample, per-feature normalization over time on (B, T, F)
    (reference NormalizationLayer, recurrent.py:282-290: InstanceNorm1d
    with no affine params)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.var(x32, axis=1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Residual recurrent encoders (reference recurrent.py)


def time_reduction(xs, factor=2):
    """Mean-pool time by `factor`, zero-padding T to divisible (reference
    recurrent.py:25-39 — same math as the v2 TimeReduction)."""
    b, t, h = xs.shape
    pad = (-t) % factor
    xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    return xs.reshape(b, (t + pad) // factor, factor, h).mean(axis=2)


def residual_rnn_init(key, input_size, hidden_size, num_layers,
                      out_size=None):
    """ResidualRNNModel (reference recurrent.py:138-169): input LayerNorm →
    LSTM0 → [LSTM_i + LayerNorm, residual] × (L-1) → optional Linear head.

    The reference only creates the head when `vocab_size == hidden_size`
    (recurrent.py:161-162) — the legacy Transducer hits that branch by
    passing hidden_size twice (models.py:56).  Pass out_size=None to skip.
    """
    keys = jax.random.split(key, num_layers + 2)
    params = {
        'ln_in': layer_norm_init(input_size),
        'layers': [rnn.lstm_init(keys[0], input_size, hidden_size)]
        + [rnn.lstm_init(keys[i], hidden_size, hidden_size)
           for i in range(1, num_layers)],
        'lns': [layer_norm_init(hidden_size) for _ in range(num_layers - 1)],
    }
    if out_size is not None:
        params['head'] = linear_init(keys[num_layers], hidden_size, out_size)
    return params


def residual_rnn_apply(params, xs, state=None, reduce_before_layer=None):
    """Returns (ys, new_state); state is a list of per-layer (h, c).

    `reduce_before_layer=k` applies the ×2 TimeReduction before layer k
    (the sane reading of the reference's merge_first module-index-4 branch;
    incompatible with state carry since it changes the time base).
    """
    num_layers = len(params['layers'])
    if state is None:
        b = xs.shape[0]
        h = params['layers'][0]['w_hh'].shape[1]
        state = [(jnp.zeros((b, h), xs.dtype), jnp.zeros((b, h), xs.dtype))
                 for _ in range(num_layers)]
    xs = layer_norm(params['ln_in'], xs)
    new_state = []
    for i, layer in enumerate(params['layers']):
        if reduce_before_layer is not None and i == reduce_before_layer:
            xs = time_reduction(xs)
            state = state[:i] + [
                (jnp.zeros_like(s[0]), jnp.zeros_like(s[1]))
                for s in state[i:]]
        ys, st = rnn.lstm_layer(layer, xs, state[i])
        new_state.append(st)
        if i > 0:
            ys = layer_norm(params['lns'][i - 1], ys)
        # residual whenever dims match (reference recurrent.py:267-270)
        xs = ys + xs if xs.shape[-1] == ys.shape[-1] else ys
    if 'head' in params:
        xs = linear(params['head'], xs)
    return xs, new_state


def residual_proj_init(key, input_size, hidden_size, num_layers,
                       ff_dim=None):
    """ResidualProjModel (reference recurrent.py:184-224): blocks of
    [Linear(ff→H) →] LSTM(H) → Linear(H→ff) → fast_tanh with residual adds
    in ff-dim space.  ff_dim defaults to hidden_size // 2."""
    ff_dim = hidden_size // 2 if ff_dim is None else ff_dim
    keys = jax.random.split(key, 3 * num_layers + 1)
    blocks = []
    for i in range(num_layers):
        k_in, k_rnn, k_out = keys[3 * i:3 * i + 3]
        blk = {'rnn': rnn.lstm_init(
                   k_rnn, input_size if i == 0 else hidden_size, hidden_size),
               'proj_out': linear_init(k_out, hidden_size, ff_dim)}
        if i > 0:
            blk['proj_in'] = linear_init(k_in, ff_dim, hidden_size)
        blocks.append(blk)
    return {'blocks': blocks}


def residual_proj_apply(params, xs, state=None):
    """Returns (ys (B, T, ff_dim), new_state list of (h, c))."""
    blocks = params['blocks']
    if state is None:
        b = xs.shape[0]
        state = [(jnp.zeros((b, blk['rnn']['w_hh'].shape[1]), xs.dtype),) * 2
                 for blk in blocks]
    new_state = []
    for i, blk in enumerate(blocks):
        h = linear(blk['proj_in'], xs) if i > 0 else xs
        h, st = rnn.lstm_layer(blk['rnn'], h, state[i])
        new_state.append(st)
        h = fast_tanh(linear(blk['proj_out'], h))
        xs = h + xs if xs.shape[-1] == h.shape[-1] else h
    return xs, new_state


# ---------------------------------------------------------------------------
# RNNModel — CTC-style LSTM tagger (reference models.py:13-44)


def rnn_model_init(key, input_size, vocab_size, hidden_size, num_layers):
    k1, k2 = jax.random.split(key)
    return {
        'norm': batch_norm_init(input_size),
        'lstm': rnn.stacked_lstm_init(k1, input_size, hidden_size,
                                      num_layers),
        'head': linear_init(k2, hidden_size, vocab_size),
    }


def rnn_model_apply(params, xs, state=None, train=False):
    """(B, T, F) → (logits (B, T, V), state).  Eval-mode batch norm by
    default (the running-stat update path is exercised in training only)."""
    num_layers = len(params['lstm']['layers'])
    hidden = params['lstm']['layers'][0]['w_hh'].shape[1]
    if state is None:
        state = rnn.lstm_zero_state(num_layers, xs.shape[0], hidden,
                                    xs.dtype)
    xs, _ = batch_norm(params['norm'], xs, train=train)
    ys, state = rnn.stacked_lstm(params['lstm'], xs, state)
    return linear(params['head'], ys), state


def ctc_prefix_beam_search(logp, beam_width, blank=BLANK):
    """CTC prefix beam search over (T, V) log-probs → (best labels, -logp).

    Host-side numpy (decoding a single utterance is not TPU work).  The
    reference's RNNModel.beam_search calls an undefined `ctc_beam`
    (models.py:40-44) — this is the working implementation of what that
    call was meant to do, tested against brute-force path enumeration.
    """
    logp = np.asarray(logp, np.float64)
    T, V = logp.shape
    NEG = -np.inf

    def logaddexp(a, b):
        return np.logaddexp(a, b)

    # prefix → (logp ending in blank, logp ending in non-blank)
    beams = {(): (0.0, NEG)}
    for t in range(T):
        new = {}
        for prefix, (p_b, p_nb) in beams.items():
            p_tot = logaddexp(p_b, p_nb)
            # extend with blank: prefix unchanged
            nb_b, nb_nb = new.get(prefix, (NEG, NEG))
            new[prefix] = (logaddexp(nb_b, p_tot + logp[t, blank]), nb_nb)
            for v in range(V):
                if v == blank:
                    continue
                ext = prefix + (v,)
                e_b, e_nb = new.get(ext, (NEG, NEG))
                if prefix and prefix[-1] == v:
                    # repeat char: needs a blank in between to extend
                    new[ext] = (e_b, logaddexp(e_nb, p_b + logp[t, v]))
                    # staying on the same char merges into this prefix
                    s_b, s_nb = new.get(prefix, (NEG, NEG))
                    new[prefix] = (s_b, logaddexp(s_nb, p_nb + logp[t, v]))
                else:
                    new[ext] = (e_b, logaddexp(e_nb, p_tot + logp[t, v]))
        beams = dict(sorted(
            new.items(), key=lambda kv: -np.logaddexp(*kv[1]))[:beam_width])
    best, (p_b, p_nb) = max(beams.items(),
                            key=lambda kv: np.logaddexp(*kv[1]))
    return list(best), -float(np.logaddexp(p_b, p_nb))


# ---------------------------------------------------------------------------
# Legacy Transducer (reference models.py:46-117)


@dataclasses.dataclass(frozen=True)
class LegacyTransducerConfig:
    input_size: int
    vocab_size: int
    vocab_embed_size: int
    hidden_size: int
    num_layers: int
    pred_hidden_size: int = -1     # -1 → hidden_size (reference :53-54)
    pred_num_layers: int = 1
    blank: int = BLANK

    @property
    def pred_hidden(self):
        return (self.hidden_size if self.pred_hidden_size == -1
                else self.pred_hidden_size)


def legacy_transducer_init(key, cfg: LegacyTransducerConfig):
    keys = jax.random.split(key, 5)
    return {
        'encoder': residual_rnn_init(
            keys[0], cfg.input_size, cfg.hidden_size, cfg.num_layers,
            out_size=cfg.hidden_size),   # vocab==hidden branch, see above
        'embed': embedding_init(keys[1], cfg.vocab_size,
                                cfg.vocab_embed_size, padding_idx=BOS),
        'decoder': rnn.stacked_lstm_init(
            keys[2], cfg.vocab_embed_size, cfg.pred_hidden,
            cfg.pred_num_layers),
        'fc1': linear_init(keys[3], cfg.hidden_size + cfg.pred_hidden,
                           cfg.hidden_size),
        'fc2': linear_init(keys[4], cfg.hidden_size, cfg.vocab_size),
    }


def legacy_joint(params, f, g):
    """fc2(fast_tanh(fc1(cat(f, g)))) — broadcast-free algebraic split:
    fc1 is applied as two column-block matmuls so f (…, T, 1, H) and
    g (…, 1, U, H) never materialize a concatenated tensor."""
    w = params['fc1']['w']
    h_f = jax.lax.dot_general(
        f, w[:, :f.shape[-1]].astype(f.dtype),
        (((f.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h_g = jax.lax.dot_general(
        g, w[:, f.shape[-1]:].astype(g.dtype),
        (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = fast_tanh(h_f + h_g + params['fc1']['b'].astype(jnp.float32))
    return linear(params['fc2'], h.astype(f.dtype))


def _decoder_states(cfg, ys_in, params):
    """BOS-prepended prediction-net outputs (B, U+1, H)."""
    bos = jnp.full((ys_in.shape[0], 1), BOS, jnp.int32)
    tokens = jnp.concatenate([bos, ys_in], axis=1)
    emb = embedding(params['embed'], tokens, padding_idx=BOS)
    state = rnn.lstm_zero_state(cfg.pred_num_layers, ys_in.shape[0],
                                cfg.pred_hidden, emb.dtype)
    ymat, _ = rnn.stacked_lstm(params['decoder'], emb, state)
    return ymat


def legacy_transducer_logits(params, cfg, xs, ys):
    """(B, T, U+1, V) joint logits (reference forward, models.py:73-86)."""
    h_enc, _ = residual_rnn_apply(params['encoder'], xs)
    ymat = _decoder_states(cfg, ys, params)
    return legacy_joint(params, h_enc[:, :, None, :], ymat[:, None, :, :])


def legacy_transducer_loss(params, cfg, xs, ys, xlen, ylen):
    """Mean RNN-T loss through the repo's production lattice core."""
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss
    logits = legacy_transducer_logits(params, cfg, xs, ys)
    return jnp.mean(rnnt_loss(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
        ys, xlen, ylen, blank=cfg.blank))


def legacy_greedy_decode(params, cfg, xs, xlen):
    """Batched frame-synchronous greedy decode (reference models.py:88-117):
    scan over encoder frames with where-gated prediction-net state."""
    h_enc, _ = residual_rnn_apply(params['encoder'], xs)
    B = h_enc.shape[0]
    bos = jnp.full((B, 1), BOS, jnp.int32)
    emb = embedding(params['embed'], bos, padding_idx=BOS)
    state0 = rnn.lstm_zero_state(cfg.pred_num_layers, B, cfg.pred_hidden,
                                 emb.dtype)
    h_pre0, state0 = rnn.stacked_lstm(params['decoder'], emb, state0)

    def step(carry, h_t):
        h_pre, state = carry
        logits = legacy_joint(params, h_t, h_pre)
        logs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        pred = jnp.argmax(logs, axis=-1).astype(jnp.int32)
        prob = jnp.max(logs, axis=-1)
        emb_p = embedding(params['embed'], pred[:, None], padding_idx=BOS)
        h_new, st_new = rnn.stacked_lstm(params['decoder'], emb_p, state)
        adv = pred != cfg.blank
        h_pre = jnp.where(adv[:, None], h_new[:, 0], h_pre)
        state = jax.tree.map(
            lambda n, o: jnp.where(adv[None, :, None], n, o), st_new, state)
        return (h_pre, state), (pred, prob)

    _, (y_seq, probs) = jax.lax.scan(step, (h_pre0[:, 0], state0),
                                     jnp.swapaxes(h_enc, 0, 1))
    y_seq = jnp.swapaxes(y_seq, 0, 1)
    neg_logp = -jnp.sum(jnp.swapaxes(probs, 0, 1), axis=1)
    return y_seq, neg_logp


# ---------------------------------------------------------------------------
# MFCC_ featurizer (reference recurrent.py:42-135)


def amplitude_to_db(spec, top_db=80.0, amin=1e-10):
    """Power → dB with per-clip top_db floor (torchaudio amplitude_to_DB
    semantics used by the reference MFCC_, recurrent.py:80-85,120)."""
    db = 10.0 * jnp.log10(jnp.maximum(spec, amin))
    return jnp.maximum(db, db.max() - top_db)


def cmvn_sliding(feat, win_size=201, variance=False):
    """Sliding-window cepstral mean (± variance) normalization over time on
    (T, F) — speechpy `cmvnw` semantics (reference recurrent.py:131): each
    frame is normalized by the statistics of a centered, edge-clamped
    window.  Vectorized via cumulative sums instead of speechpy's Python
    loop."""
    feat = np.asarray(feat, np.float64)
    T = feat.shape[0]
    half = win_size // 2
    pad = np.pad(feat, ((half, half), (0, 0)), mode='edge')
    csum = np.cumsum(np.vstack([np.zeros((1, feat.shape[1])), pad]), axis=0)
    mean = (csum[win_size:] - csum[:-win_size]) / win_size
    out = feat - mean
    if variance:
        csq = np.cumsum(
            np.vstack([np.zeros((1, feat.shape[1])), pad ** 2]), axis=0)
        ex2 = (csq[win_size:] - csq[:-win_size]) / win_size
        std = np.sqrt(np.maximum(ex2 - mean ** 2, 0.0)) + 1e-10
        out = out / std
    return out.astype(np.float32)


def legacy_mfcc(audio, sample_rate=16000, n_mfcc=40, n_fft=400,
                hop_length=200, n_mels=128, log_mels=False, normalize=False):
    """MFCC_ equivalent: mel power spectrogram → log or DB scale → DCT-II
    (ortho) → optional sliding-window CMVN.  Returns (T, n_mfcc)."""
    from edgedict_tpu import features as F

    audio = jnp.asarray(audio, jnp.float32)
    window = F.hann_window(n_fft, periodic=True)
    spec = F.stft_power(audio[None], window, n_fft, hop_length)[0]  # (T,nfft/2+1)
    mel_fb = F.mel_filters(sample_rate, n_fft, n_mels, htk=True, norm=None)
    mel = spec @ mel_fb.T
    if log_mels:
        mel = jnp.log(mel + 1e-6)
    else:
        mel = amplitude_to_db(mel)
    out = mel @ F.dct_matrix(n_mfcc, n_mels)
    if normalize:
        out = jnp.asarray(cmvn_sliding(np.asarray(out), win_size=201))
    return out
