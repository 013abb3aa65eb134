"""Fused greedy frame-loop kernel (ops/decode_pallas.py) == the lax.scan
frame loop (stream.py), which is itself pinned against the reference
semantics (rnnt/stream.py:102-119) by tests/test_stream.py.

All cases run the kernel in interpret mode (EDGEDICT_PALLAS_DECODE=force
on the CPU test backend) — the same kernel code path the TPU compiles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgedict_tpu.features import FeatureConfig
from edgedict_tpu.models import transducer as T
from edgedict_tpu.stream import (
    _make_chunk_step_fn, make_stream_state, prepare_inference_params)

# kernel-eligible geometry: vocab/joint/dec_proj/dec_hidden lane-aligned
ECFG = T.TransducerConfig(
    vocab_size=256, vocab_embed_size=16, input_size=9,
    enc_hidden_size=16, enc_layers=1, enc_proj_size=24,
    dec_hidden_size=128, dec_layers=2, dec_proj_size=128,
    joint_size=128, enc_time_reductions=())

UNK = 3


def _frame_loop(params, cfg, unk_id):
    return _make_chunk_step_fn(params, cfg, None, unk_id).frame_loop


def _run_both(monkeypatch, params, cfg, state, enc_xs, unk_id):
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    ref = _frame_loop(params, cfg, unk_id)(params, state, enc_xs)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    out = _frame_loop(params, cfg, unk_id)(params, state, enc_xs)
    return ref, out


def _assert_match(ref, out, atol=1e-5):
    tok_r, hdec_r, (hs_r, cs_r) = ref
    tok_o, hdec_o, (hs_o, cs_o) = out
    np.testing.assert_array_equal(np.asarray(tok_r), np.asarray(tok_o))
    for r, o in ((hdec_r, hdec_o), (hs_r, hs_o), (cs_r, cs_o)):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(o, np.float32), atol=atol)


@pytest.mark.parametrize('batch,t,unk_id', [(1, 6, UNK), (8, 1, UNK),
                                            (4, 10, None)])
def test_fused_matches_scan(monkeypatch, batch, t, unk_id):
    params = prepare_inference_params(
        T.transducer_init(jax.random.PRNGKey(0), ECFG))
    state = make_stream_state(params, ECFG, batch=batch)
    enc = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, t, ECFG.enc_proj_size))
    ref, out = _run_both(monkeypatch, params, ECFG, state, enc, unk_id)
    _assert_match(ref, out)
    assert np.asarray(ref[0]).shape == (t, batch)


def _biased_params(column, bump):
    """Params whose joint output bias favors `column` — drives the argmax
    into a chosen id so specific loop branches are exercised."""
    params = T.transducer_init(jax.random.PRNGKey(2), ECFG)
    b = params['joint']['out']['b'].at[column].add(bump)
    params['joint']['out']['b'] = b
    return prepare_inference_params(params)


def test_fused_blank_heavy_path(monkeypatch):
    """Blank wins most frames: the prediction net must NOT advance."""
    params = _biased_params(int(ECFG.blank), 8.0)
    state = make_stream_state(params, ECFG, batch=2)
    enc = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 8, ECFG.enc_proj_size)) * 0.1
    ref, out = _run_both(monkeypatch, params, ECFG, state, enc, UNK)
    _assert_match(ref, out)
    assert (np.asarray(ref[0]) == ECFG.blank).mean() > 0.9
    # blank everywhere → decoder state must equal the initial state
    np.testing.assert_allclose(np.asarray(out[2][0]),
                               np.asarray(state.dec_state[0]))


def test_fused_unk_reargmax(monkeypatch):
    """<unk> wins the raw argmax everywhere: both paths must re-argmax
    with <unk> suppressed and stay in lockstep."""
    params = _biased_params(UNK, 8.0)
    state = make_stream_state(params, ECFG, batch=2)
    enc = jax.random.normal(jax.random.PRNGKey(4),
                            (2, 6, ECFG.enc_proj_size))
    ref, out = _run_both(monkeypatch, params, ECFG, state, enc, UNK)
    _assert_match(ref, out)
    assert not (np.asarray(ref[0]) == UNK).any()


def test_fused_bf16(monkeypatch):
    """Production bf16 serving policy: ONLY the encoder is cast — the
    joint/prediction net stay fp32 (prepare_inference_params), bf16
    encoder frames are upcast at the frame loop, and the whole token loop
    (kernel and scan alike) runs fp32 — the on-chip token-exactness
    guarantee."""
    params = prepare_inference_params(
        T.transducer_init(jax.random.PRNGKey(5), ECFG), jnp.bfloat16)
    assert params['encoder']['layers'][0]['rnn']['w_hh'].dtype \
        == jnp.bfloat16
    assert params['joint']['out']['w'].dtype == jnp.float32
    assert params['decoder']['proj']['w'].dtype == jnp.float32
    state = make_stream_state(params, ECFG, batch=4)
    assert state.h_dec.dtype == jnp.float32
    enc = jax.random.normal(jax.random.PRNGKey(6),
                            (4, 8, ECFG.enc_proj_size)).astype(jnp.bfloat16)
    ref, out = _run_both(monkeypatch, params, ECFG, state, enc, UNK)
    _assert_match(ref, out)
    assert out[1].dtype == jnp.float32


def test_fused_bf16_fully_cast(monkeypatch):
    """Fully bf16-cast parameter tree (cast_floating — NOT the serving
    policy): the kernel runs bf16 arithmetic and must still match the
    scan bit-for-bit in interpret mode."""
    from edgedict_tpu.stream import cast_floating
    params = prepare_inference_params(cast_floating(
        T.transducer_init(jax.random.PRNGKey(5), ECFG), jnp.bfloat16))
    assert params['joint']['out']['w'].dtype == jnp.bfloat16
    state = make_stream_state(params, ECFG, batch=4)
    enc = jax.random.normal(jax.random.PRNGKey(6),
                            (4, 8, ECFG.enc_proj_size)).astype(jnp.bfloat16)
    ref, out = _run_both(monkeypatch, params, ECFG, state, enc, UNK)
    _assert_match(ref, out, atol=2e-2)
    assert out[1].dtype == jnp.bfloat16


def test_fused_sharded_matches_scan(monkeypatch):
    """Kernel under shard_map on a dp mesh (sharded server decode) == the
    unmeshed scan."""
    from jax.sharding import Mesh

    from edgedict_tpu.ops import rnn as rnn_ops

    params = prepare_inference_params(
        T.transducer_init(jax.random.PRNGKey(7), ECFG))
    batch = 16
    state = make_stream_state(params, ECFG, batch=batch)
    enc = jax.random.normal(jax.random.PRNGKey(8),
                            (batch, 5, ECFG.enc_proj_size))
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    ref = _frame_loop(params, ECFG, UNK)(params, state, enc)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    mesh = Mesh(np.array(jax.devices()[:2]), ('dp',))
    with rnn_ops.mesh_context(mesh, 'dp'):
        out = _frame_loop(params, ECFG, UNK)(params, state, enc)
    _assert_match(ref, out)


def test_ineligible_batch_falls_back_under_mesh(monkeypatch):
    """Per-shard batch not tile-aligned → the route declines (returns the
    scan result) instead of mis-sharding."""
    from jax.sharding import Mesh

    from edgedict_tpu.ops import decode_pallas as dp
    from edgedict_tpu.ops import rnn as rnn_ops

    params = prepare_inference_params(
        T.transducer_init(jax.random.PRNGKey(9), ECFG))
    state = make_stream_state(params, ECFG, batch=6)
    enc = jax.random.normal(jax.random.PRNGKey(10),
                            (6, 3, ECFG.enc_proj_size))
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    mesh = Mesh(np.array(jax.devices()[:2]), ('dp',))
    with rnn_ops.mesh_context(mesh, 'dp'):
        assert dp.maybe_greedy_frame_loop(
            params, ECFG, state, enc, UNK) is None


def test_streaming_decoder_end_to_end_fused(monkeypatch):
    """Full StreamingDecoder (featurizer → encoder → fused frame loop),
    per-chunk AND block-grouped, matches the scan decoder's text."""
    from edgedict_tpu.stream import StreamingDecoder

    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)

    class _Tok:
        unk_id = UNK

        def id_to_token(self, i):
            return chr(ord('a') + i % 26) + '</w>'

    params = T.transducer_init(jax.random.PRNGKey(11), ECFG)
    audio = (np.random.RandomState(0).randn(40 * 40) * 0.3
             ).astype(np.float32)

    def run(block):
        dec = StreamingDecoder(params, ECFG, feature_cfg, _Tok(),
                               step_n_frame=2, block_chunks=block)
        return dec.decode_wav(audio)

    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    ref_chunk, ref_block = run(1), run(4)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    assert run(1) == ref_chunk
    assert run(4) == ref_block


@pytest.mark.parametrize('batch,t,block', [(3, 10, '4'),   # pad batch + partial tail block
                                           (8, 4, '32'),   # whole-T (block > T)
                                           (2, 7, '1')])   # per-frame blocking
def test_offline_fused_matches_scan(monkeypatch, batch, t, block):
    """maybe_greedy_decode (T-blocked grid, frame log-probs) == the offline
    lax.scan in models/decoding.py: tokens exact, neg_logp close."""
    from edgedict_tpu.models.decoding import greedy_decode_from_encoder

    params = T.transducer_init(jax.random.PRNGKey(20), ECFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(21),
                              (batch, t, ECFG.enc_proj_size))
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    y_ref, nlp_ref = greedy_decode_from_encoder(params, ECFG, h_enc)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', block)
    y_out, nlp_out = greedy_decode_from_encoder(params, ECFG, h_enc)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_out))
    np.testing.assert_allclose(np.asarray(nlp_ref), np.asarray(nlp_out),
                               rtol=1e-5, atol=1e-5)
    assert y_out.shape == (batch, t)


def test_offline_fused_bf16(monkeypatch):
    """bf16 params + bf16 encoder output through the offline fused path."""
    from edgedict_tpu.models.decoding import greedy_decode_from_encoder

    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        T.transducer_init(jax.random.PRNGKey(22), ECFG))
    h_enc = jax.random.normal(jax.random.PRNGKey(23),
                              (4, 9, ECFG.enc_proj_size)).astype(jnp.bfloat16)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    y_ref, nlp_ref = greedy_decode_from_encoder(params, ECFG, h_enc)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', '4')
    y_out, nlp_out = greedy_decode_from_encoder(params, ECFG, h_enc)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_out))
    np.testing.assert_allclose(np.asarray(nlp_ref, np.float32),
                               np.asarray(nlp_out, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_first_argmax_matches_jnp_argmax():
    """Ties resolve to the first max; rows containing NaN resolve to the
    FIRST NaN (jnp.argmax semantics) instead of the out-of-range sentinel."""
    from edgedict_tpu.ops.decode_pallas import _first_argmax

    x = np.zeros((4, 8), np.float32)
    x[0] = [1, 3, 3, 0, 2, 3, 1, 0]                  # tie → first max
    x[1] = [1, 2, np.nan, 0, np.nan, 9, 1, 0]        # NaN wins, first NaN
    x[2] = [-np.inf] * 8                             # all equal → 0
    x[3] = [0, 1, 2, 3, 4, 5, 6, 7]
    got = np.asarray(_first_argmax(jnp.asarray(x)))[:, 0]
    want = np.asarray(jnp.argmax(jnp.asarray(x), axis=1))
    np.testing.assert_array_equal(got, want)


def test_streaming_declines_mixed_dtype(monkeypatch):
    """f32-prepared params driven with bf16 encoder output: the streaming
    route must decline (same policy as the offline route) — the kernel
    would multiply in the cached f32 while the scan casts weights to bf16
    per op."""
    from edgedict_tpu.ops import decode_pallas as dp

    params = prepare_inference_params(
        T.transducer_init(jax.random.PRNGKey(30), ECFG))      # f32 cache
    state = make_stream_state(params, ECFG, batch=2)
    enc = jax.random.normal(jax.random.PRNGKey(31),
                            (2, 4, ECFG.enc_proj_size)).astype(jnp.bfloat16)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    assert dp.maybe_greedy_frame_loop(params, ECFG, state, enc, UNK) is None


def test_probe_runs_eagerly_under_tracing(monkeypatch):
    """The Mosaic compile probe must actually execute (not be staged as
    dead code) when first reached from inside a jit trace — otherwise a
    kernel the backend rejects would memoize ok=True and the serving step
    would die inside jit instead of falling back to the scan."""
    from edgedict_tpu.ops import decode_pallas as dp

    monkeypatch.setattr(dp, '_TPU_PROBE', [])
    saw_tracer = []
    orig = dp._call_kernel

    def spy(cache, f, *a, **k):
        saw_tracer.append(isinstance(f, jax.core.Tracer))
        return orig(cache, f, *a, **k)

    monkeypatch.setattr(dp, '_call_kernel', spy)

    @jax.jit
    def traced(x):
        ok = dp._tpu_kernel_works()          # reached at trace time
        return x + (1.0 if ok else 0.0)

    traced(jnp.zeros(()))
    assert saw_tracer and not any(saw_tracer)
    assert dp._TPU_PROBE == [True]


def test_offline_fused_declines_mixed_dtype(monkeypatch):
    """bf16 encoder output over f32 params promotes differently in the
    scan — the fused route must decline rather than drift."""
    from edgedict_tpu.ops import decode_pallas as dp

    params = T.transducer_init(jax.random.PRNGKey(24), ECFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(25),
                              (2, 3, ECFG.enc_proj_size)).astype(jnp.bfloat16)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    assert dp.maybe_greedy_decode(params, ECFG, h_enc) is None


def test_offline_declines_under_sharded_mesh(monkeypatch):
    """Sharded eval (mesh axis > 1) keeps the scan — GSPMD splits it; the
    offline route must decline rather than run an unsharded kernel."""
    from jax.sharding import Mesh

    from edgedict_tpu.ops import decode_pallas as dp
    from edgedict_tpu.ops import rnn as rnn_ops

    params = T.transducer_init(jax.random.PRNGKey(32), ECFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(33),
                              (4, 3, ECFG.enc_proj_size))
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    mesh = Mesh(np.array(jax.devices()[:2]), ('dp',))
    with rnn_ops.mesh_context(mesh, 'dp'):
        assert dp.maybe_greedy_decode(params, ECFG, h_enc) is None


def test_offline_fused_under_jit(monkeypatch):
    """The fused offline decode traces under jit (trainer-eval call shape)
    and matches the scan."""
    from edgedict_tpu.models.decoding import transducer_greedy_decode

    params = T.transducer_init(jax.random.PRNGKey(26), ECFG)
    xs = jax.random.normal(jax.random.PRNGKey(27), (2, 12, ECFG.input_size))
    xlen = jnp.asarray([12, 8])
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    y_ref, len_ref, nlp_ref = jax.jit(
        lambda p, x, l: transducer_greedy_decode(p, ECFG, x, l))(
            params, xs, xlen)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', '4')
    y_out, len_out, nlp_out = jax.jit(
        lambda p, x, l: transducer_greedy_decode(p, ECFG, x, l))(
            params, xs, xlen)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_out))
    np.testing.assert_array_equal(np.asarray(len_ref), np.asarray(len_out))
    np.testing.assert_allclose(np.asarray(nlp_ref), np.asarray(nlp_out),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('seed', range(3))
def test_fuzz_random_geometry_matches_scan(monkeypatch, seed):
    """Randomized lane-aligned geometry (layer count, batch, T, vocab,
    joint width, decode block): offline AND streaming fused paths equal
    the scan."""
    from edgedict_tpu.models.decoding import greedy_decode_from_encoder

    rng = np.random.RandomState(seed)
    cfg = T.TransducerConfig(
        vocab_size=128 * rng.randint(1, 3),
        vocab_embed_size=8 * rng.randint(1, 4), input_size=9,
        enc_hidden_size=16, enc_layers=1,
        enc_proj_size=8 * rng.randint(1, 5),
        dec_hidden_size=128, dec_layers=rng.randint(1, 4),
        dec_proj_size=128, joint_size=128 * rng.randint(1, 3),
        enc_time_reductions=())
    batch, t = rng.randint(1, 10), rng.randint(1, 20)
    params = T.transducer_init(jax.random.PRNGKey(seed), cfg)
    h_enc = jax.random.normal(jax.random.PRNGKey(seed + 100),
                              (batch, t, cfg.enc_proj_size))

    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    y_ref, nlp_ref = greedy_decode_from_encoder(params, cfg, h_enc)
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', str(rng.randint(1, 8)))
    y_out, nlp_out = greedy_decode_from_encoder(params, cfg, h_enc)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_out))
    np.testing.assert_allclose(np.asarray(nlp_ref), np.asarray(nlp_out),
                               rtol=1e-5, atol=1e-5)

    p2 = prepare_inference_params(params)
    state = make_stream_state(p2, cfg, batch=batch)
    ref, out = _run_both(monkeypatch, p2, cfg, state, h_enc,
                         rng.randint(4, cfg.vocab_size))
    _assert_match(ref, out)


def test_multistream_fused_matches_scan(monkeypatch):
    """Server mode with a non-aligned stream count (pad path)."""
    from edgedict_tpu.stream import MultiStreamDecoder

    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)

    class _Tok:
        unk_id = UNK

        def id_to_token(self, i):
            return chr(ord('a') + i % 26) + '</w>'

    params = T.transducer_init(jax.random.PRNGKey(12), ECFG)

    def run():
        dec = MultiStreamDecoder(params, ECFG, feature_cfg, _Tok(),
                                 n_streams=3, step_n_frame=2)
        rng = np.random.RandomState(1)
        outs = ['' for _ in range(3)]
        for _ in range(3):
            frames = (rng.randn(3, dec.win_size) * 0.3).astype(np.float32)
            for s, text in enumerate(dec.decode(frames)):
                outs[s] += text
        return outs

    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', '0')
    ref = run()
    monkeypatch.setenv('EDGEDICT_PALLAS_DECODE', 'force')
    assert run() == ref


def test_decode_block_rounds_to_sublane_rule(monkeypatch):
    """EDGEDICT_DECODE_BLOCK values that would produce an invalid Mosaic
    BlockSpec (sublane dim of a REAL block not divisible by 8) are
    rounded; whole-T (k == t) stays as-is since it's always legal."""
    from edgedict_tpu.ops.decode_pallas import _decode_block
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', '2')
    assert _decode_block(100) == 8       # k < t: rounded up to 8
    assert _decode_block(2) == 2         # k == t: whole-T, legal
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', '20')
    assert _decode_block(100) == 16      # rounded down to a multiple of 8
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', '32')
    assert _decode_block(100) == 32      # already legal
    assert _decode_block(10) == 10       # clamped to whole-T
    monkeypatch.setenv('EDGEDICT_DECODE_BLOCK', '5')
    # small t: the sublane round-up (8) would exceed t — re-clamped to
    # whole-T so the function's own contract (k <= t) holds
    assert _decode_block(6) == 6
    assert _decode_block(8) == 8
