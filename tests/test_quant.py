"""Int8 weight-only serving (ops/quant.py).

Ladder: quantizer math → kernel-vs-XLA parity (interpret mode via
EDGEDICT_QUANT_KERNELS=force + shard_local_context, the idiom from
test_rnn_pallas) → quantized encoder routing → full StreamingDecoder /
sharded MultiStreamDecoder integration.  The accuracy statement vs fp32
is measured on chip (VALIDATION.md); here we pin that the quantized
ROUTES agree with each other and that quantization error is bounded by
its analytic envelope.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edgedict_tpu.features import FeatureConfig
from edgedict_tpu.models import transducer as T
from edgedict_tpu.ops import quant
from edgedict_tpu.ops import rnn as rnn_ops
from edgedict_tpu.stream import StreamingDecoder, prepare_inference_params

CFG = T.TransducerConfig(
    vocab_size=16, vocab_embed_size=8, input_size=9,
    enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
    joint_size=16, enc_time_reductions=())

# kernel-eligible geometry (h % 128 == 0, 4H col-blockable)
KCFG = T.TransducerConfig(
    vocab_size=16, vocab_embed_size=8, input_size=9,
    enc_hidden_size=128, enc_layers=2, enc_proj_size=128,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
    joint_size=16, enc_time_reductions=())


class _Tok:
    unk_id = 3

    def id_to_token(self, i):
        return chr(ord('a') + i) + '</w>'


def test_quantize_int8_error_envelope():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * \
        jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (1, 48)))
    q, scale = quant.quantize_int8(w)
    assert q.dtype == jnp.int8 and scale.shape == (1, 48)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale)
                 - np.asarray(w))
    # symmetric rounding: |err| <= scale/2 per element
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()
    # all-zero column gets scale 1 and exact zeros
    q0, s0 = quant.quantize_int8(jnp.zeros((8, 4)))
    assert (np.asarray(q0) == 0).all() and (np.asarray(s0) == 1.0).all()


def test_quant_matmul_kernel_matches_xla(monkeypatch):
    """Interpret-mode kernel == dequantize-then-dot, including the
    zero-padded-K case (layer-0 W_ih: in_size below the int8 sublane
    tile)."""
    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', 'force')
    key = jax.random.PRNGKey(2)
    for k_in, n in ((240, 512), (128, 384), (9, 128)):
        kw, kx = jax.random.split(jax.random.fold_in(key, n))
        w = jax.random.normal(kw, (k_in, n))
        q, s = quant.quantize_int8(w)
        qp = quant._pad_rows_to(q, 32)
        x = jax.random.normal(kx, (5, k_in))
        b = jnp.zeros((1, n), jnp.float32)
        with rnn_ops.shard_local_context():
            got = quant._quant_matmul(x, qp, s, b)
        want = quant._dequant_matmul_xla(x, qp, s, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_lstm_layer_q_kernel_matches_fallback(monkeypatch):
    """Quantized recurrence kernel (interpret) == the dequantize-delegate
    scan fallback on the same int8 weights."""
    h = 128
    params = rnn_ops.lstm_init(jax.random.PRNGKey(3), 24, h)
    enc = {'norm': {'scale': jnp.ones(24), 'bias': jnp.zeros(24)},
           'layers': [{'rnn': params,
                       'ln': {'scale': jnp.ones(h), 'bias': jnp.zeros(h)}}],
           'proj': {'w': jnp.eye(h), 'b': jnp.zeros(h)}}
    qrnn = quant.quantize_encoder(enc)['layers'][0]['rnn']
    xs = jax.random.normal(jax.random.PRNGKey(4), (6, 3, 24))
    state = (jnp.zeros((3, h)), jnp.zeros((3, h)))

    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', 'force')
    with rnn_ops.shard_local_context():
        ys_k, (h_k, c_k) = quant.lstm_layer_tm_q(qrnn, xs, state)
    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', '0')
    ys_f, (h_f, c_f) = quant.lstm_layer_tm_q(qrnn, xs, state)

    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_f),
                               rtol=1e-4, atol=1e-5)


def test_quantized_encoder_routes_and_approximates_fp32(monkeypatch):
    """encoder_apply on int8 params: kernel route == fallback route, and
    both sit within the quantization-noise envelope of the fp32 encoder."""
    params = T.transducer_init(jax.random.PRNGKey(5), KCFG)
    prepared = prepare_inference_params(params, quantize='int8')
    enc = prepared['encoder']
    assert enc['layers'][0]['rnn']['w_hh_q'].dtype == jnp.int8
    assert 'w_ih' not in enc['layers'][0]['rnn']
    assert enc['proj']['w_q'].dtype == jnp.int8
    xs = jax.random.normal(jax.random.PRNGKey(6), (2, 8, KCFG.input_size))

    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', 'force')
    with rnn_ops.shard_local_context():
        ys_k, st_k = T.encoder_apply(enc, KCFG, xs)
    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', '0')
    ys_f, st_f = T.encoder_apply(enc, KCFG, xs)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_f),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_k[0]), np.asarray(st_f[0]),
                               rtol=1e-4, atol=2e-5)

    ys32, _ = T.encoder_apply(params['encoder'], KCFG, xs)
    rms = float(jnp.sqrt(jnp.mean((ys_f - ys32) ** 2)))
    ref = float(jnp.sqrt(jnp.mean(ys32 ** 2)))
    assert rms < 0.05 * ref, (rms, ref)


def test_streaming_decoder_int8_matches_fallback_tokens(monkeypatch):
    """Full streaming decode on int8 params: the kernel route and the
    dequantize fallback decode the SAME tokens (same quantized weights,
    same argmax decisions), and chunked state-carrying works end to end."""
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(7), KCFG)
    rng = np.random.RandomState(0)
    audio = rng.randn(4 * 120).astype(np.float32) * 0.5

    def decode_all(dec):
        out = ''
        for i in range(3):
            chunk = audio[i * dec.hop_size:i * dec.hop_size + dec.win_size]
            out += dec.decode(chunk)
        return out

    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', 'force')
    with rnn_ops.shard_local_context():
        dec_k = StreamingDecoder(params, KCFG, feature_cfg, _Tok(),
                                 step_n_frame=2, quantize='int8')
        out_k = decode_all(dec_k)
    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', '0')
    dec_f = StreamingDecoder(params, KCFG, feature_cfg, _Tok(),
                             step_n_frame=2, quantize='int8')
    out_f = decode_all(dec_f)
    assert out_k == out_f


def test_streaming_beam_decoder_int8_matches_fallback(monkeypatch):
    """Beam search over an int8 encoder: kernel route == dequant fallback
    (the beam machinery consumes encoder frames; the int8 route must not
    perturb its hypotheses relative to the same quantized weights)."""
    from edgedict_tpu.stream import StreamingBeamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(11), KCFG)
    rng = np.random.RandomState(1)
    audio = rng.randn(4 * 120).astype(np.float32) * 0.5

    def decode_all(dec):
        out = []
        for i in range(2):
            chunk = audio[i * dec.hop_size:i * dec.hop_size + dec.win_size]
            out.append(dec.decode(chunk))
        return out

    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', 'force')
    with rnn_ops.shard_local_context():
        dec_k = StreamingBeamDecoder(params, KCFG, feature_cfg, _Tok(),
                                     step_n_frame=2, beam_width=2,
                                     max_tokens=16, quantize='int8')
        out_k = decode_all(dec_k)
    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', '0')
    dec_f = StreamingBeamDecoder(params, KCFG, feature_cfg, _Tok(),
                                 step_n_frame=2, beam_width=2,
                                 max_tokens=16, quantize='int8')
    assert out_k == decode_all(dec_f)


def test_multistream_sharded_int8_matches_unsharded():
    """int8 serving under a dp-sharded mesh: the GSPMD trace takes the XLA
    dequant fallback (pallas_call is not partitionable) and matches the
    unsharded int8 decoder token-for-token."""
    from edgedict_tpu.parallel import make_mesh
    from edgedict_tpu.stream import MultiStreamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(8), CFG)
    mesh = make_mesh(dp=8)
    n = 8
    sharded = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                                 n_streams=n, step_n_frame=2, mesh=mesh,
                                 quantize='int8')
    plain = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                               n_streams=n, step_n_frame=2,
                               quantize='int8')
    rng = np.random.RandomState(3)
    audios = rng.randn(n, sharded.win_size * 2).astype(np.float32) * 0.5
    for c in range(2):
        chunk = audios[:, c * sharded.hop_size:
                       c * sharded.hop_size + sharded.win_size]
        assert sharded.decode(chunk) == plain.decode(chunk)


def test_gru_layer_q_kernel_matches_fallback(monkeypatch):
    """Quantized GRU recurrence kernel (interpret) == the
    dequantize-delegate fallback on the same int8 weights."""
    h = 128
    params = rnn_ops.gru_init(jax.random.PRNGKey(12), 24, h)
    enc = {'norm': {'scale': jnp.ones(24), 'bias': jnp.zeros(24)},
           'layers': [{'rnn': params,
                       'ln': {'scale': jnp.ones(h), 'bias': jnp.zeros(h)}}],
           'proj': {'w': jnp.eye(h), 'b': jnp.zeros(h)}}
    qrnn = quant.quantize_encoder(enc)['layers'][0]['rnn']
    xs = jax.random.normal(jax.random.PRNGKey(13), (6, 3, 24))
    h0 = jnp.zeros((3, h))

    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', 'force')
    with rnn_ops.shard_local_context():
        ys_k, h_k = quant.gru_layer_tm_q(qrnn, xs, h0)
    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', '0')
    ys_f, h_f = quant.gru_layer_tm_q(qrnn, xs, h0)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_f),
                               rtol=1e-4, atol=1e-5)


def test_gru_streaming_decoder_int8(monkeypatch):
    """End-to-end GRU encoder int8 serving: kernel route tokens == the
    dequant fallback's (mirrors the LSTM decoder test)."""
    import dataclasses
    gcfg = dataclasses.replace(KCFG, module_type='GRU')
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(14), gcfg)
    rng = np.random.RandomState(2)
    audio = rng.randn(4 * 120).astype(np.float32) * 0.5

    def decode_all(dec):
        out = ''
        for i in range(3):
            chunk = audio[i * dec.hop_size:i * dec.hop_size + dec.win_size]
            out += dec.decode(chunk)
        return out

    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', 'force')
    with rnn_ops.shard_local_context():
        dec_k = StreamingDecoder(params, gcfg, feature_cfg, _Tok(),
                                 step_n_frame=2, quantize='int8')
        out_k = decode_all(dec_k)
    monkeypatch.setenv('EDGEDICT_QUANT_KERNELS', '0')
    dec_f = StreamingDecoder(params, gcfg, feature_cfg, _Tok(),
                             step_n_frame=2, quantize='int8')
    assert out_k == decode_all(dec_f)


def test_quantize_rejects_unknown_modes():
    params = T.transducer_init(jax.random.PRNGKey(10), CFG)
    with pytest.raises(ValueError):
        prepare_inference_params(params, quantize='int4')


def test_quantized_values_independent_of_serving_dtype():
    """Advisor round 4: q/scale must come from the PRE-CAST fp32 weights,
    so a live bf16 int8 decoder and a fp32 `cli.export --quantize` artifact
    carry byte-identical int8 values (pass-through leaves — biases, LN —
    still follow the serving dtype; scales stay fp32 for the kernels)."""
    params = T.transducer_init(jax.random.PRNGKey(5), CFG)
    p32 = prepare_inference_params(params, None, quantize='int8')
    p16 = prepare_inference_params(params, jnp.bfloat16, quantize='int8')

    def leaves(t, pred, prefix=''):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                out.update(leaves(v, pred, f'{prefix}{k}.'))
            return out
        if isinstance(t, (list, tuple)):
            out = {}
            for i, v in enumerate(t):
                out.update(leaves(v, pred, f'{prefix}{i}.'))
            return out
        return {prefix: t} if pred(prefix) else {}

    is_q = lambda k: ('_q.' in k or k.endswith('.w_q.')
                      or 'scale' in k) and '_decode' not in k
    q32 = leaves(p32['encoder'], is_q)
    q16 = leaves(p16['encoder'], is_q)
    assert set(q32) == set(q16) and q32
    for k in q32:
        np.testing.assert_array_equal(np.asarray(q32[k]),
                                      np.asarray(q16[k]), err_msg=k)
        if 'scale' in k:
            assert q16[k].dtype == jnp.float32, k
    # pass-through leaves follow the serving dtype
    b16 = leaves(p16['encoder'],
                 lambda k: k.endswith('.b_ih.') and '_decode' not in k)
    assert b16 and all(v.dtype == jnp.bfloat16 for v in b16.values())


def test_sharded_int8_fallback_warns_once():
    """Advisor round 4: the silent XLA dequantize fallback under a sharded
    mesh must announce itself (the footprint/latency win doesn't hold)."""
    import warnings
    from edgedict_tpu.parallel import make_mesh
    from edgedict_tpu.stream import MultiStreamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(8), CFG)
    quant._warned_sharded = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        dec = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                                 n_streams=8, step_n_frame=2,
                                 mesh=make_mesh(dp=8), quantize='int8')
        rng = np.random.RandomState(3)
        dec.decode(rng.randn(8, dec.win_size).astype(np.float32) * 0.5)
    msgs = [x for x in w if 'dequantize fallback' in str(x.message)]
    assert len(msgs) == 1
