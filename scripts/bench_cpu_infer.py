"""CPU-backend streaming inference throughput — the reference's own
deployment story (VERDICT round 4 missing #2).

The reference's entire published latency table is edge-CPU streaming
(/root/reference/README.md:110-127): 5.8-6.0 sec-audio/sec on a 2-core
i5-8250U via PyTorch/ONNX/OpenVINO with the E6D2 model.  This harness
runs THIS framework's streaming decoder on the XLA:CPU backend with the
same model shapes and the same per-chunk protocol (one ~150 ms chunk per
step, text fetched every chunk) and reports sec-audio/sec per backend:

  * jit    — the live jitted chunk step (the PyTorch row's analog)
  * int8   — weight-only int8 encoder (the OpenVINO-quantized analog;
             on CPU the XLA dequantize fallback serves, so this is a
             correctness row more than a speed row)
  * block  — layer-major block dispatch (8 chunks/step), the serving
             configuration, same math

Weights are random — throughput depends on shapes, not values; the WER
half of the CPU story is covered by the trained-model serving A/Bs
(scripts/synthetic_convergence --quant_ab).  Prints one JSON line.

  python -m scripts.bench_cpu_infer [--seconds 30] [--threads N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=30.0,
                    help='audio per timed pass')
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--backends', default='jit,int8,block')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')   # sitecustomize pre-imports
    try:
        cache = os.path.expanduser('~/.cache/edgedict_tpu_xla')
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass
    assert jax.default_backend() == 'cpu', jax.default_backend()

    from edgedict_tpu.features import FeatureConfig
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.stream import StreamingDecoder

    # E6D2 flagship shapes (reference flagfiles/E6D2.txt), as in bench.py
    cfg = T.TransducerConfig(
        vocab_size=2048, vocab_embed_size=64, input_size=240,
        enc_hidden_size=1024, enc_layers=6, enc_proj_size=640,
        dec_hidden_size=256, dec_layers=2, dec_proj_size=256,
        joint_size=640, enc_time_reductions=(1,))
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=80, n_fft=512,
        win_length=320, hop_length=200, downsample=3,
        pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)

    class _Tok:
        unk_id = 3

        def id_to_token(self, i):
            return f'<{i}>'

    rng = np.random.RandomState(1)
    audio = (rng.randn(int(SR * args.seconds)) * 0.1).astype(np.float32)

    def timed(dec, block=1):
        n = (len(audio) - dec.win_size) // dec.hop_size + 1
        n -= n % block
        chunks = [audio[j * dec.hop_size:j * dec.hop_size + dec.win_size]
                  for j in range(n)]

        def one_pass():
            dec.reset()
            start = time.time()
            if block > 1:
                import jax.numpy as jnp
                for i in range(0, n, block):
                    b = jnp.asarray(np.stack(chunks[i:i + block]))
                    tokens, dec.state = dec.group_step(dec.params,
                                                       dec.state, b)
                np.asarray(tokens)
            else:
                for c in chunks:
                    dec.decode(c)
            return time.time() - start

        one_pass()                                  # compile
        wall = min(one_pass() for _ in range(args.reps))
        audio_sec = n * dec.hop_size / SR
        return audio_sec / wall, wall / n * 1e3

    out = {'metric': 'cpu_streaming_throughput',
           'unit': 'sec_audio_per_sec',
           'reference_cpu_baseline': 5.797,   # README.md:123-127, i5-8250U
           'host': f'{os.cpu_count()} cpu(s)'}
    backends = args.backends.split(',')
    if 'jit' in backends:
        dec = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                               step_n_frame=4)
        tp, ms = timed(dec)
        out['jit_throughput'] = round(tp, 3)
        out['jit_chunk_ms'] = round(ms, 2)
        out['value'] = round(tp, 3)
        out['vs_baseline'] = round(tp / 5.797, 3)
    if 'int8' in backends:
        dec = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                               step_n_frame=4, quantize='int8')
        tp, ms = timed(dec)
        out['int8_throughput'] = round(tp, 3)
        out['int8_chunk_ms'] = round(ms, 2)
    if 'block' in backends:
        dec = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                               step_n_frame=2, block_chunks=8)
        tp, ms = timed(dec, block=8)
        out['block8_throughput'] = round(tp, 3)
        out['block8_chunk_ms'] = round(ms, 2)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
