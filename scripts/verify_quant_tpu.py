"""On-chip verification of int8 weight-only serving (ops/quant.py).

Run on the real TPU (PYTHONPATH must APPEND, see .claude/skills/verify):

    PYTHONPATH="/root/repo:$PYTHONPATH" python -m scripts.verify_quant_tpu

Legs:
  1. Mosaic compile + route check at E6D2 scale (the kernels actually
     engage — fail loudly if the route silently fell back).
  2. Token agreement: int8 serving vs the production bf16 route and vs
     fp32, streamed over synthetic audio at B=1 (the int8 accuracy story
     on REAL weights is measured by scripts/synthetic_convergence
     --quantize; this leg bounds random-weight argmax flips).
  3. Device-time A/B: per-chunk (B=1) total device op time via
     jax.profiler, bf16 vs int8.  Measured result (VALIDATION.md §3e):
     latency-NEUTRAL (0.95x) — the chunk step sits on the per-layer
     kernel/serial-recurrence floor, not the weight DMA — so the
     assertion only guards against regression; int8's win is the
     halved HBM footprint plus the exact-int accuracy of leg 2.
"""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.features import FeatureConfig
from edgedict_tpu.models import transducer as T
from edgedict_tpu import stream
from scripts.trace_train_step import device_op_events


class _Tok:
    unk_id = 3

    def id_to_token(self, i):
        return f'<{i}>'


CFG = T.TransducerConfig(
    vocab_size=2048, vocab_embed_size=64, input_size=240,
    enc_hidden_size=1024, enc_layers=6, enc_proj_size=640,
    dec_hidden_size=256, dec_layers=2, dec_proj_size=256,
    joint_size=640, enc_time_reductions=(1,))
FCFG = FeatureConfig(feature_type='logfbank', feature_size=80, n_fft=512,
                     win_length=320, hop_length=200, downsample=3,
                     pad_to_divisible=False)


def _decoder(params, dtype, quantize=None):
    return stream.StreamingDecoder(params, CFG, FCFG, _Tok(),
                                   step_n_frame=4, compute_dtype=dtype,
                                   quantize=quantize)


def _stream_tokens(dec, chunks):
    dec.reset()
    out = []
    state = dec.state
    for c in chunks:
        toks, state = dec.chunk_step(dec.params, state, c)
        out.append(np.asarray(toks))
    return np.concatenate([o.ravel() for o in out])


def _device_ms_per_step(dec, chunks, n=40):
    state = dec.state
    toks, state = dec.chunk_step(dec.params, state, chunks[0])
    np.asarray(toks)
    tdir = tempfile.mkdtemp()
    with jax.profiler.trace(tdir):
        for i in range(n):
            toks, state = dec.chunk_step(dec.params, state,
                                         chunks[i % len(chunks)])
        np.asarray(toks)
    events = device_op_events(tdir)
    return sum(us for _, us in events) / 1e3 / n


def main():
    assert jax.default_backend() == 'tpu', jax.default_backend()
    params = T.transducer_init(jax.random.PRNGKey(0), CFG)

    # --- leg 1: the quantized route really engages at E6D2 scale
    from edgedict_tpu.ops import quant
    qtree = stream.prepare_inference_params(params, jnp.bfloat16,
                                            quantize='int8')
    lrnn = qtree['encoder']['layers'][0]['rnn']
    assert lrnn['w_hh_q'].dtype == jnp.int8
    assert quant._kernels_on() and not quant._sharded_trace(), (
        'kernels must engage on a single real chip')
    xs = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 240)
                           ).astype(jnp.bfloat16)
    ys, _ = jax.jit(lambda p, x: T.encoder_apply(p, CFG, x))(
        qtree['encoder'], xs)
    assert np.isfinite(np.asarray(ys, np.float32)).all()
    print('leg1 compile+route: OK (encoder_apply through int8 kernels)')

    # GRU variant: Mosaic-compiles and runs at the same scale
    import dataclasses
    gcfg = dataclasses.replace(CFG, module_type='GRU')
    gparams = T.transducer_init(jax.random.PRNGKey(2), gcfg)
    gtree = stream.prepare_inference_params(gparams, jnp.bfloat16,
                                            quantize='int8')
    gys, _ = jax.jit(lambda p, x: T.encoder_apply(p, gcfg, x))(
        gtree['encoder'], xs)
    assert np.isfinite(np.asarray(gys, np.float32)).all()
    print('leg1b compile+route: OK (GRU int8 kernels)')

    # --- leg 2: streamed token agreement
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000 * 30) * 0.1).astype(np.float32)
    dec32 = _decoder(params, None)
    n = (len(audio) - dec32.win_size) // dec32.hop_size + 1
    chunks = [jnp.asarray(audio[j * dec32.hop_size:
                                j * dec32.hop_size + dec32.win_size])[None]
              for j in range(n)]
    t32 = _stream_tokens(dec32, chunks)
    dec_bf = _decoder(params, jnp.bfloat16)
    t_bf = _stream_tokens(dec_bf, chunks)
    dec_q = _decoder(params, jnp.bfloat16, quantize='int8')
    t_q = _stream_tokens(dec_q, chunks)
    m_bf = float((t_q != t_bf).mean())
    m_32 = float((t_q != t32).mean())
    print(f'leg2 token agreement over {t32.size} frames: '
          f'int8-vs-bf16 mismatch {m_bf:.4f}, int8-vs-fp32 {m_32:.4f} '
          f'(bf16-vs-fp32 {float((t_bf != t32).mean()):.4f})')
    assert m_32 < 0.10, m_32   # random weights: argmax near-ties dominate

    # --- leg 3: per-chunk device time
    ms_bf = _device_ms_per_step(dec_bf, chunks)
    ms_q = _device_ms_per_step(dec_q, chunks)
    print(f'leg3 per-chunk device op time: bf16 {ms_bf:.3f} ms, '
          f'int8 {ms_q:.3f} ms ({ms_bf / ms_q:.2f}x)')
    assert ms_q < ms_bf * 1.05, 'int8 must not be slower than bf16'

    # --- leg 4: 256-stream server round must not regress (the int8
    # kernels see their large-batch shapes here: xproj rows 512,
    # recurrence B=256)
    def server_ms(quantize):
        sdec = stream.MultiStreamDecoder(params, CFG, FCFG, _Tok(),
                                         n_streams=256, step_n_frame=2,
                                         compute_dtype=jnp.bfloat16,
                                         quantize=quantize)
        frames = jnp.asarray((rng.randn(256, sdec.win_size) * 0.1
                              ).astype(np.float32))
        return _device_ms_per_step(sdec, [frames], n=20)

    sms_bf = server_ms(None)
    sms_q = server_ms('int8')
    print(f'leg4 256-stream server round device op time: bf16 '
          f'{sms_bf:.3f} ms, int8 {sms_q:.3f} ms ({sms_bf / sms_q:.2f}x)')
    assert sms_q < sms_bf * 1.10, 'int8 server rounds must not regress'
    print('ALL LEGS PASSED')


if __name__ == '__main__':
    main()
