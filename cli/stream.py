"""Streaming decode CLI: wav file or microphone (the reference stream.py,
/root/reference/stream.py:71-134).

  python -m cli.stream --flagfile logs/<name>/flagfile.txt --path x.wav
  python -m cli.stream --flagfile ... --mic          (needs sounddevice)

Silence policy: after `--reset_after` consecutive empty chunk decodes the
decoder state is reset and "[Background]" printed (reference
stream.py:92-98).
"""

import os

from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_string('path', None, 'decode a wav file and exit')
flags.DEFINE_bool('mic', False, 'stream from the microphone')
flags.DEFINE_integer('step_n_frame', 2, 'encoder frames per chunk')
flags.DEFINE_integer('reset_after', 35,
                     'reset state after N consecutive blank chunks')
flags.DEFINE_string('model_name', None,
                    'checkpoint file name under logs/<name>/models '
                    '(default: latest)')
flags.DEFINE_integer('beam_width', 1,
                     '>1 switches to streaming beam search')
flags.DEFINE_bool('merge_prefixes', True,
                  'exact Graves prefix-probability summation in beam search')
flags.DEFINE_integer('max_sym_per_frame', 3,
                     'beam search label-expansion budget per encoder '
                     'frame; raise for models with bursty (many tokens '
                     'per frame) alignments')
flags.DEFINE_string('lm_path', None,
                    'trained LM checkpoint (cli.train_lm writes '
                    'logs/<name>/lm.ckpt): enables shallow fusion when '
                    'beam_width > 1')
flags.DEFINE_float('lm_weight', 0.2, 'shallow-fusion LM weight')
flags.DEFINE_string('infer_dtype', 'auto',
                    'decode compute dtype: auto (bf16 on TPU, fp32 '
                    'elsewhere), bf16, or fp32 — bf16 params halve the '
                    'decode weight streaming that bounds B=1 throughput')
flags.DEFINE_integer('block_chunks', 1,
                     '>1 decodes N chunks per device dispatch (layer-major '
                     'block mode: same output, ~1.6x the throughput at '
                     'N*75 ms extra latency; used by --path one-shot mode)')
flags.DEFINE_string('quantize', '',
                    "'int8' = weight-only int8 encoder (per-channel "
                    'symmetric scales, in-kernel dequant — halves the '
                    'serving weight footprint at equal latency and '
                    'token-exact-vs-fp32 accuracy; ops/quant.py). '
                    'Single-device only: under a sharded mesh '
                    '(--serve_dp_size>1) or a multi-device session the int8 '
                    'ops fall back to an XLA dequantize path (tokens stay '
                    'exact, but weights are dequantized per dispatch — no '
                    'footprint/latency win; a one-time warning is emitted). '
                    'Empty = serve at --infer_dtype precision.')


def load_inference_bundle(FLAGS):
    """Tokenizer + configs + checkpoint params + compute dtype from flags —
    shared by cli.stream and cli.serve.
    Returns (params, cfg, feature_cfg, tokenizer, compute_dtype,
    quantize)."""
    import jax
    from edgedict_tpu.checkpoint import (
        checkpoint_path, latest_step, load_checkpoint)
    from edgedict_tpu.features import FeatureConfig
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.trainer import build_tokenizer

    tokenizer = build_tokenizer(FLAGS)
    assert getattr(tokenizer, 'tokenizer', None) is not None or \
        getattr(tokenizer, 'token2id', None) is not None, \
        'tokenizer cache not found — train first or point at a BPE cache'

    feature_cfg = FeatureConfig.from_flags(FLAGS, pad_to_divisible=False)
    cfg = T.TransducerConfig.from_flags(
        FLAGS, vocab_size=tokenizer.vocab_size,
        input_size=feature_cfg.input_size)
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)

    logdir = os.path.join(FLAGS.logdir_root, FLAGS.name)
    step = latest_step(logdir)
    if FLAGS.model_name:
        path = os.path.join(logdir, 'models', FLAGS.model_name)
    elif step is not None:
        path = checkpoint_path(logdir, step)
    else:
        path = None
    if path and os.path.exists(path):
        payload = load_checkpoint(path, params)
        params = jax.tree.map(jax.numpy.asarray, payload['model'])
        print(f'loaded {path}')
    else:
        print('WARNING: no checkpoint found — using random weights')
    compute_dtype = resolve_infer_dtype(getattr(FLAGS, 'infer_dtype',
                                                'auto'))
    quantize = getattr(FLAGS, 'quantize', '') or None
    return params, cfg, feature_cfg, tokenizer, compute_dtype, quantize


def load_lm_fusion(FLAGS):
    """--lm_path/--lm_weight → the `lm=(params, cfg, λ)` triple the beam
    decoders take for shallow fusion, or None."""
    path = getattr(FLAGS, 'lm_path', None)
    if not path:
        return None
    from edgedict_tpu.models.lm import load_lm_checkpoint
    lm_params, lm_cfg = load_lm_checkpoint(path)
    print(f'LM fusion: {path} (lambda={FLAGS.lm_weight})')
    return lm_params, lm_cfg, float(FLAGS.lm_weight)


def build_stream_decoder(FLAGS):
    from edgedict_tpu.stream import StreamingDecoder

    params, cfg, feature_cfg, tokenizer, compute_dtype, quantize = \
        load_inference_bundle(FLAGS)
    if getattr(FLAGS, 'beam_width', 1) > 1:
        from edgedict_tpu.stream import StreamingBeamDecoder
        return StreamingBeamDecoder(
            params, cfg, feature_cfg, tokenizer,
            step_n_frame=FLAGS.step_n_frame,
            beam_width=FLAGS.beam_width,
            max_sym_per_frame=getattr(FLAGS, 'max_sym_per_frame', 3),
            merge_prefixes=getattr(FLAGS, 'merge_prefixes', True),
            block_chunks=getattr(FLAGS, 'block_chunks', 1),
            lm=load_lm_fusion(FLAGS),
            compute_dtype=compute_dtype, quantize=quantize)
    return StreamingDecoder(params, cfg, feature_cfg, tokenizer,
                            step_n_frame=FLAGS.step_n_frame,
                            block_chunks=getattr(FLAGS, 'block_chunks', 1),
                            compute_dtype=compute_dtype, quantize=quantize)


def resolve_infer_dtype(name):
    import jax
    import jax.numpy as jnp
    if name == 'auto':
        return jnp.bfloat16 if jax.default_backend() == 'tpu' else None
    return {'bf16': jnp.bfloat16, 'bfloat16': jnp.bfloat16,
            'fp32': None, 'float32': None}[name]


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    decoder = build_stream_decoder(FLAGS)

    if FLAGS.path:
        from edgedict_tpu.data import load_audio
        audio, sr = load_audio(FLAGS.path)
        assert sr == 16000, f'expected 16 kHz audio, got {sr}'
        text = decoder.decode_wav(audio)
        print(text)
        if decoder.elapsed:
            import numpy as np
            mean_ms = float(np.mean(decoder.elapsed)) * 1000
            audio_s = len(audio) / sr
            total = sum(decoder.elapsed)
            print(f'[chunks {len(decoder.elapsed)}  mean {mean_ms:.2f} ms  '
                  f'throughput {audio_s / total:.2f} sec/sec]')
        return

    if FLAGS.mic:
        import numpy as np
        import sounddevice as sd
        blank_count = 0
        buf = np.zeros(0, np.float32)
        # greedy decode() emits NEW text per chunk (append-print); beam
        # decode() returns the CURRENT FULL hypothesis, which may revise
        # earlier output — re-render the line and count 'no change' as
        # silence instead of 'empty'
        is_beam = hasattr(decoder, 'beam')
        last = ['']

        def callback(indata, frames, t, status):
            nonlocal blank_count, buf
            buf = np.concatenate([buf, indata[:, 0].astype(np.float32)])
            while len(buf) >= decoder.win_size:
                text = decoder.decode(buf[:decoder.win_size])
                buf = buf[decoder.hop_size:]
                progressed = text != last[0] if is_beam else bool(text)
                if is_beam and progressed:
                    pad = max(len(last[0]) - len(text), 0)
                    print('\r' + text + ' ' * pad, end='', flush=True)
                elif progressed:
                    print(text, end='', flush=True)
                last[0] = text
                if progressed:
                    blank_count = 0
                else:
                    blank_count += 1
                    if blank_count >= FLAGS.reset_after:
                        print('\n[Background]')
                        decoder.reset()
                        blank_count = 0
                        last[0] = ''

        with sd.InputStream(samplerate=16000, channels=1,
                            callback=callback):
            print('listening (ctrl-c to stop)')
            import time
            while True:
                time.sleep(0.1)

    raise app.UsageError('pass --path <wav> or --mic')


if __name__ == '__main__':
    app.run(main)
