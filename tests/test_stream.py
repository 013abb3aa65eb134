"""Streaming runtime tests.

Key property (SURVEY §4 implication c): a state-carrying encoder driven
chunk-by-chunk must equal the full-sequence encoder bit-for-bit — this is
what makes unbounded streaming equivalent to offline decode.
"""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.features import FeatureConfig
from edgedict_tpu.models import transducer as T
from edgedict_tpu.models.decoding import greedy_decode_from_encoder
from edgedict_tpu.stream import (
    StreamingDecoder, make_chunk_step, make_stream_state,
    stream_chunk_geometry)

CFG = T.TransducerConfig(
    vocab_size=16, vocab_embed_size=8, input_size=9,
    enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
    joint_size=16, enc_time_reductions=())   # no time reduction in streaming


def test_chunked_encoder_equals_full():
    params = T.transducer_init(jax.random.PRNGKey(0), CFG)
    xs = jax.random.normal(jax.random.PRNGKey(1), (1, 12, CFG.input_size))
    full, _ = T.encoder_apply(params['encoder'], CFG, xs)
    state = T.encoder_zero_state(CFG, 1)
    outs = []
    for i in range(0, 12, 2):
        y, state = T.encoder_apply(params['encoder'], CFG, xs[:, i:i + 2],
                                   state)
        outs.append(y)
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-5, atol=1e-6)


def test_chunked_greedy_equals_batched_greedy():
    """Streaming frame loop over chunks == offline greedy decode on the same
    encoder output sequence."""
    params = T.transducer_init(jax.random.PRNGKey(2), CFG)
    h_enc = jax.random.normal(jax.random.PRNGKey(3), (1, 10, CFG.enc_proj_size))
    y_ref, _ = greedy_decode_from_encoder(params, CFG, h_enc)

    # streaming: same frame-sync loop, carried across "chunks" of 2 frames
    from edgedict_tpu.stream import StreamState
    state = make_stream_state(params, CFG)
    toks = []
    for i in range(0, 10, 2):
        def frame(carry, h_enc_t):
            h_dec, dec_state = carry
            logits = T.joint_apply(params['joint'], h_enc_t, h_dec)[0]
            pred = jnp.argmax(logits).astype(jnp.int32)
            h_dec_new, dec_state_new = T.decoder_apply(
                params['decoder'], CFG, pred[None, None], dec_state)
            adv = pred != CFG.blank
            h_dec = jnp.where(adv, h_dec_new[:, 0], h_dec)
            dec_state = jax.tree.map(
                lambda new, old: jnp.where(adv, new, old),
                dec_state_new, dec_state)
            return (h_dec, dec_state), pred

        (h_dec, dec_state), preds = jax.lax.scan(
            frame, (state.h_dec, state.dec_state),
            jnp.swapaxes(h_enc[:, i:i + 2], 0, 1)[:, 0])
        state = StreamState(enc_state=state.enc_state, dec_state=dec_state,
                            h_dec=h_dec)
        toks.append(np.asarray(preds))
    np.testing.assert_array_equal(np.concatenate(toks), np.asarray(y_ref)[0])


class _Tok:
    unk_id = 3

    def id_to_token(self, i):
        return chr(ord('a') + i) + '</w>'


def test_streaming_decoder_end_to_end():
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    cfg = T.TransducerConfig(
        vocab_size=16, vocab_embed_size=8, input_size=9,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
        joint_size=16, enc_time_reductions=())
    params = T.transducer_init(jax.random.PRNGKey(4), cfg)
    dec = StreamingDecoder(params, cfg, feature_cfg, _Tok(), step_n_frame=2)
    win, hop = stream_chunk_geometry(40, 20, 3, 2)
    assert (dec.win_size, dec.hop_size) == (win, hop)
    audio = np.random.RandomState(0).randn(win * 4).astype(np.float32)
    text = dec.decode_wav(audio)
    assert isinstance(text, str)
    assert len(dec.elapsed) > 0
    # decode never emits raw <unk>/<nul> pieces
    assert '<' not in text


def test_streaming_reset_policy():
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(5), CFG)
    dec = StreamingDecoder(params, CFG, feature_cfg, _Tok(),
                           step_n_frame=2, reset_step=2)
    chunk = np.zeros(dec.win_size, np.float32)
    dec.decode(chunk)
    s1 = dec.state
    dec.decode(chunk)           # triggers reset after 2 steps
    assert dec._steps == 0
    np.testing.assert_allclose(
        np.asarray(dec.state.enc_state[0]),
        np.zeros_like(np.asarray(s1.enc_state[0])))


def test_multistream_matches_single_streams():
    """N-stream server decode == N independent single-stream decodes."""
    from edgedict_tpu.stream import MultiStreamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(7), CFG)
    multi = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                               n_streams=3, step_n_frame=2)
    singles = [StreamingDecoder(params, CFG, feature_cfg, _Tok(),
                                step_n_frame=2) for _ in range(3)]
    rng = np.random.RandomState(0)
    audios = rng.randn(3, multi.win_size * 3).astype(np.float32) * 0.5

    multi_out = ['' for _ in range(3)]
    single_out = ['' for _ in range(3)]
    for c in range(3):
        chunk = audios[:, c * multi.hop_size:
                       c * multi.hop_size + multi.win_size]
        outs = multi.decode(chunk)
        for s in range(3):
            multi_out[s] += outs[s]
            single_out[s] += singles[s].decode(chunk[s])
    assert multi_out == single_out

    # per-stream reset leaves the other streams' state untouched
    st_before = np.asarray(multi.state.enc_state[0][:, 1])
    multi.reset_stream(0)
    np.testing.assert_allclose(
        np.asarray(multi.state.enc_state[0][:, 1]), st_before)
    np.testing.assert_allclose(
        np.asarray(multi.state.enc_state[0][:, 0]), 0.0)


def test_multistream_beam_matches_single_stream_beam():
    """N-stream server beam decode == N independent streaming beam
    decoders (same beams, same revisable hypotheses, one dispatch)."""
    from edgedict_tpu.stream import (
        MultiStreamBeamDecoder, StreamingBeamDecoder)
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(9), CFG)
    multi = MultiStreamBeamDecoder(params, CFG, feature_cfg, _Tok(),
                                   n_streams=3, step_n_frame=2,
                                   beam_width=3, max_tokens=24)
    singles = [StreamingBeamDecoder(params, CFG, feature_cfg, _Tok(),
                                    step_n_frame=2, beam_width=3,
                                    max_tokens=24) for _ in range(3)]
    rng = np.random.RandomState(1)
    audios = rng.randn(3, multi.win_size * 3).astype(np.float32) * 0.5

    for c in range(3):
        chunk = audios[:, c * multi.hop_size:
                       c * multi.hop_size + multi.win_size]
        outs = multi.decode(chunk)
        wants = [singles[s].decode(chunk[s]) for s in range(3)]
        assert outs == wants, (c, outs, wants)

    # per-stream reset zeroes only that stream's beam + encoder state
    logp_before = np.asarray(multi.beam.logp[1])
    multi.reset_stream(0)
    np.testing.assert_allclose(np.asarray(multi.beam.logp[1]), logp_before)
    assert int(multi.beam.n_tok[0, 0]) == 0
    np.testing.assert_allclose(
        np.asarray(multi.enc_state[0][:, 0]), 0.0)


def test_multistream_sharded_over_mesh_matches_unsharded():
    """Server mode over a device mesh: streams sharded over 'dp' produce
    exactly the unsharded decoder's output (multi-chip serving scale-out —
    capacity is streams/chip × chips; streams are independent so the step
    emits no collectives)."""
    from edgedict_tpu.parallel import make_mesh
    from edgedict_tpu.stream import MultiStreamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(11), CFG)
    mesh = make_mesh(dp=8)
    n = 16
    sharded = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                                 n_streams=n, step_n_frame=2, mesh=mesh)
    plain = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                               n_streams=n, step_n_frame=2)
    rng = np.random.RandomState(3)
    audios = rng.randn(n, sharded.win_size * 3).astype(np.float32) * 0.5
    for c in range(3):
        chunk = audios[:, c * sharded.hop_size:
                       c * sharded.hop_size + sharded.win_size]
        assert sharded.decode(chunk) == plain.decode(chunk)
        if c == 1:          # per-stream reset composes with the sharding
            sharded.reset_stream(5)
            plain.reset_stream(5)


def test_block_decode_matches_sequential():
    """Layer-major block decode (group step) == chunk-by-chunk decode:
    same text, same carried state — including across a TimeReduction
    (boundaries align because every chunk contributes the same even
    number of frames)."""
    from edgedict_tpu.stream import StreamingDecoder
    cfg = T.TransducerConfig(
        vocab_size=16, vocab_embed_size=8, input_size=9,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
        joint_size=16, enc_time_reductions=(0,))
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(13), cfg)
    blocked = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                               step_n_frame=2, block_chunks=4)
    seq = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                           step_n_frame=2)
    rng = np.random.RandomState(5)
    audio = rng.randn(blocked.win_size + 7 * blocked.hop_size
                      ).astype(np.float32) * 0.5
    assert blocked.decode_wav(audio) == seq.decode_wav(audio)
    for a, b in zip(jax.tree.leaves(blocked.state),
                    jax.tree.leaves(seq.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_multistream_beam_sharded_over_mesh_matches_unsharded():
    """Beam server mode over a device mesh == unsharded beam server mode
    (streams at axis 0, dec/lm RNN states at axis 1; independent beams →
    no collectives)."""
    from edgedict_tpu.parallel import make_mesh
    from edgedict_tpu.stream import MultiStreamBeamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(17), CFG)
    mesh = make_mesh(dp=8)
    n = 16
    kw = dict(n_streams=n, step_n_frame=2, beam_width=3)
    sharded = MultiStreamBeamDecoder(params, CFG, feature_cfg, _Tok(),
                                     mesh=mesh, **kw)
    plain = MultiStreamBeamDecoder(params, CFG, feature_cfg, _Tok(), **kw)
    rng = np.random.RandomState(9)
    audios = rng.randn(n, sharded.win_size * 3).astype(np.float32) * 0.5
    for c in range(3):
        chunk = audios[:, c * sharded.hop_size:
                       c * sharded.hop_size + sharded.win_size]
        assert sharded.decode(chunk) == plain.decode(chunk)
        if c == 1:
            sharded.reset_stream(3)
            plain.reset_stream(3)


def test_beam_decode_wav_and_block_match_sequential():
    """StreamingBeamDecoder.decode_wav works (the cli.stream --path
    --beam_width path) and block-grouped beam advance equals sequential
    chunk decode."""
    from edgedict_tpu.stream import StreamingBeamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(21), CFG)
    kw = dict(step_n_frame=2, beam_width=3)
    blocked = StreamingBeamDecoder(params, CFG, feature_cfg, _Tok(),
                                   block_chunks=4, **kw)
    seq = StreamingBeamDecoder(params, CFG, feature_cfg, _Tok(), **kw)
    rng = np.random.RandomState(11)
    audio = rng.randn(blocked.win_size + 7 * blocked.hop_size
                      ).astype(np.float32) * 0.5
    assert blocked.decode_wav(audio) == seq.decode_wav(audio)
    np.testing.assert_allclose(np.asarray(blocked.beam.logp),
                               np.asarray(seq.beam.logp), rtol=1e-5,
                               atol=1e-5)
    assert len(blocked.elapsed) < len(seq.elapsed)   # fewer dispatches


def test_decode_wav_pipelined_matches_decode_wav():
    """Lag-1-fetch pipelined offline decode == plain block decode."""
    from edgedict_tpu.stream import StreamingDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(23), CFG)
    dec = StreamingDecoder(params, CFG, feature_cfg, _Tok(),
                           step_n_frame=2, block_chunks=4)
    rng = np.random.RandomState(13)
    audio = rng.randn(dec.win_size + 7 * dec.hop_size
                      ).astype(np.float32) * 0.5
    a = dec.decode_wav(audio)
    b = dec.decode_wav_pipelined(audio)
    # pipelined drops the trailing partial block; compare its prefix
    assert b and a.startswith(b.rstrip()) or a == b


def test_block_decode_matches_per_chunk_under_reset_policy():
    """reset_step NOT a multiple of block_chunks: block mode must fire the
    periodic reset at the SAME chunk as per-chunk decode (falls back to a
    per-chunk pass on reset-crossing blocks), and the pipelined offline
    path honors the policy by delegating to decode_wav."""
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(9), CFG)
    mk = lambda block: StreamingDecoder(
        params, CFG, feature_cfg, _Tok(), step_n_frame=2,
        block_chunks=block, reset_step=3)      # 3 % 2 != 0
    per_chunk = mk(1)
    blocky = mk(2)
    rng = np.random.RandomState(1)
    audio = (rng.randn(per_chunk.win_size
                       + 7 * per_chunk.hop_size) * 0.5).astype(np.float32)
    a = per_chunk.decode_wav(audio)
    b = blocky.decode_wav(audio)
    assert a == b
    c = blocky.decode_wav_pipelined(audio)
    assert c == a


def test_bf16_decode_block_matches_sequential():
    """The production serving dtype: compute_dtype=bf16 (params cast once,
    features cast post-featurizer, scoring fp32).  The block == sequential
    bit-equality contract must survive the dtype switch, and the decoder
    must run end to end on cached-transpose params."""
    from edgedict_tpu.stream import StreamingDecoder
    cfg = T.TransducerConfig(
        vocab_size=16, vocab_embed_size=8, input_size=9,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
        joint_size=16, enc_time_reductions=(0,))
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(13), cfg)
    blocked = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                               step_n_frame=2, block_chunks=4,
                               compute_dtype=jnp.bfloat16)
    seq = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                           step_n_frame=2, compute_dtype=jnp.bfloat16)
    # serving precision policy (prepare_inference_params): the encoder was
    # cast once at construction; the joint/prediction net stay fp32 so the
    # token loop runs fp32 arithmetic (token-exact on chip)
    assert blocked.params['joint']['out']['w'].dtype == jnp.float32
    assert blocked.params['decoder']['proj']['w'].dtype == jnp.float32
    assert blocked.params['encoder']['layers'][0]['rnn']['w_hh_t'].dtype \
        == jnp.bfloat16
    rng = np.random.RandomState(5)
    audio = rng.randn(blocked.win_size + 7 * blocked.hop_size
                      ).astype(np.float32) * 0.5
    text_b = blocked.decode_wav(audio)
    text_s = seq.decode_wav(audio)
    assert isinstance(text_b, str)
    assert text_b == text_s


def test_bf16_beam_decode_runs_and_merges():
    """Beam decoder under bf16 compute: scoring stays fp32 (log_softmax
    upcasts), beam state dtypes follow the cast params, decode_wav runs."""
    from edgedict_tpu.stream import StreamingBeamDecoder
    cfg = T.TransducerConfig(
        vocab_size=16, vocab_embed_size=8, input_size=9,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
        joint_size=16, enc_time_reductions=(0,))
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(13), cfg)
    dec = StreamingBeamDecoder(params, cfg, feature_cfg, _Tok(),
                               step_n_frame=2, beam_width=3,
                               compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(6)
    audio = rng.randn(dec.win_size + 5 * dec.hop_size
                      ).astype(np.float32) * 0.5
    text = dec.decode_wav(audio)
    assert isinstance(text, str)
    # beam log-probs are fp32 regardless of compute dtype
    assert dec.beam.logp.dtype == jnp.float32


def test_multistream_int16_ingest_matches_float():
    """int16 PCM frames pass to the device untouched (scaled on device by
    features.pcm_to_float): tokens equal the float32-fed decoder's whenever
    the float frames are exact int16/32768 multiples — halves the server
    round's dominant H2D bytes (bench.py server decomposition)."""
    from edgedict_tpu.stream import MultiStreamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(7), CFG)
    a = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                           n_streams=3, step_n_frame=2)
    b = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                           n_streams=3, step_n_frame=2)
    rng = np.random.RandomState(1)
    q = (rng.randn(3, a.win_size * 3) * 8000).astype(np.int16)
    f = q.astype(np.float32) / 32768.0
    for c in range(3):
        sl = slice(c * a.hop_size, c * a.hop_size + a.win_size)
        assert a.decode(q[:, sl]) == b.decode(f[:, sl])


def test_multistream_beam_int16_ingest_matches_float():
    """The beam server must scale int16 PCM exactly like the greedy one
    (regression: decode() once cast int16 straight to float32 WITHOUT the
    1/32768 scaling, so --pcm_int16 beam serving decoded ±32767-amplitude
    garbage silently).  Also pins list-of-rows input (np-normalized before
    the dtype check)."""
    from edgedict_tpu.stream import MultiStreamBeamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(7), CFG)
    kw = dict(n_streams=3, step_n_frame=2, beam_width=2)
    a = MultiStreamBeamDecoder(params, CFG, feature_cfg, _Tok(), **kw)
    b = MultiStreamBeamDecoder(params, CFG, feature_cfg, _Tok(), **kw)
    rng = np.random.RandomState(1)
    q = (rng.randn(3, a.win_size * 3) * 8000).astype(np.int16)
    f = q.astype(np.float32) / 32768.0
    for c in range(3):
        sl = slice(c * a.hop_size, c * a.hop_size + a.win_size)
        assert a.decode(q[:, sl]) == b.decode(list(f[:, sl]))


def test_multistream_pipelined_matches_sequential():
    """decode_pipelined (lag-1 fetch overlap) emits the same per-round
    texts as decode, one round late, with flush() draining the last."""
    from edgedict_tpu.stream import MultiStreamDecoder
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(7), CFG)
    seq = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                             n_streams=3, step_n_frame=2)
    pip = MultiStreamDecoder(params, CFG, feature_cfg, _Tok(),
                             n_streams=3, step_n_frame=2)
    rng = np.random.RandomState(2)
    audios = rng.randn(3, seq.win_size * 4).astype(np.float32) * 0.5
    seq_rounds, pip_rounds = [], []
    for c in range(4):
        chunk = audios[:, c * seq.hop_size:
                       c * seq.hop_size + seq.win_size]
        seq_rounds.append(seq.decode(chunk))
        out = pip.decode_pipelined(chunk)
        if c == 0:
            assert out is None
        else:
            pip_rounds.append(out)
    pip_rounds.append(pip.flush())
    assert pip.flush() is None
    assert pip_rounds == seq_rounds
    pip.reset()
    assert pip.flush() is None
