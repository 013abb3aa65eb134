"""Streaming inference benchmark harness (the reference
cli/openvino_wav_inference.py:94-147): streams LibriSpeech test-clean (or
any wav directory) through the live and/or exported stream decoders and
reports mean WER, FPS, realtime factor (frames/time/16000) and mean
per-chunk latency for each backend.

  python -m cli.wav_inference --flagfile logs/<name>/flagfile.txt \
      [--n_samples 50] [--backends jit,exported]
"""

import os
import time

import numpy as np
from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_integer('n_samples', 50, 'utterances to benchmark')
flags.DEFINE_string('backends', 'jit',
                    'comma list: jit,exported,int8 (int8 = the jit '
                    'decoder with --quantize int8 weight-only serving, '
                    'ops/quant.py — the A/B row for the quantized '
                    'backend, as the reference table A/Bs OpenVINO)')
flags.DEFINE_string('wav_dir', None,
                    'override: directory of wavs + .trans.txt '
                    '(default LibriSpeech_test)')
flags.DEFINE_bool('per_stage', False,
                  'also report per-component ms (featurize/encoder/joint/'
                  'decoder run unfused, the reference README latency table)')


def run_backend(name, decoder, utts, tokenizer):
    from edgedict_tpu.metrics import wer
    refs, hyps = [], []
    total_audio = 0.0
    total_time = 0.0
    for audio, text in utts:
        decoder.reset()
        # greedy decode() yields NEW text per chunk (concatenate); beam
        # decode() yields the CURRENT FULL hypothesis (keep the last)
        is_beam = hasattr(decoder, 'beam')
        start = time.time()
        hyp = []
        n = (len(audio) - decoder.win_size) // decoder.hop_size + 1
        for i in range(max(n, 0)):
            chunk = audio[i * decoder.hop_size:
                          i * decoder.hop_size + decoder.win_size]
            hyp.append(decoder.decode(chunk))
        total_time += time.time() - start
        total_audio += len(audio) / 16000.0
        refs.append(text.lower())
        hyps.append((hyp[-1] if hyp and is_beam else ''.join(hyp)).strip())
    pairs = [(r, h) for r, h in zip(refs, hyps) if r.strip()]
    mean_wer = wer([r for r, _ in pairs], [h for _, h in pairs]) \
        if pairs else 1.0
    rtf = total_audio / total_time if total_time else 0.0
    mean_ms = float(np.mean(decoder.elapsed)) * 1000 \
        if getattr(decoder, 'elapsed', None) else 0.0
    print(f'[{name}] WER {mean_wer:.4f}  throughput {rtf:.3f} sec/sec  '
          f'mean chunk {mean_ms:.2f} ms  ({len(pairs)} utts, '
          f'{total_audio:.1f}s audio)')
    return mean_wer, rtf


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from cli.stream import build_stream_decoder
    from edgedict_tpu.data import Librispeech, load_audio
    from edgedict_tpu.trainer import build_tokenizer

    tokenizer = build_tokenizer(FLAGS)
    root = FLAGS.wav_dir or FLAGS.LibriSpeech_test
    ds = Librispeech(root, tokenizer, audio_max_length=999)
    utts = []
    for i in range(min(FLAGS.n_samples, len(ds))):
        rec = ds.data[i]
        audio, sr = load_audio(os.path.join(ds.root, rec['path']))
        assert sr == 16000
        utts.append((audio.astype(np.float32), rec['text']))
    print(f'benchmarking {len(utts)} utterances')

    backends = FLAGS.backends.split(',')
    if 'jit' in backends:
        dec = build_stream_decoder(FLAGS)
        run_backend('jit', dec, utts, tokenizer)
        if FLAGS.per_stage and hasattr(dec, 'profile_components'):
            stages = dec.profile_components(utts[0][0])
            print('[jit per-stage ms] ' + '  '.join(
                f'{k} {v:.3f}' for k, v in stages.items()))
    if 'int8' in backends:
        old = FLAGS.quantize
        FLAGS.quantize = 'int8'
        try:
            dec = build_stream_decoder(FLAGS)
        finally:
            FLAGS.quantize = old
        run_backend('int8', dec, utts, tokenizer)
    if 'exported' in backends:
        from edgedict_tpu.export import build_exported_decoder
        dec = build_exported_decoder(FLAGS)
        run_backend('exported', dec, utts, tokenizer)


if __name__ == '__main__':
    app.run(main)
