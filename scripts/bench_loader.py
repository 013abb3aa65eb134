"""Host data-pipeline throughput: can the loader feed the chip?

The train step consumes batches at ~8100 audio-seconds/s on one v5e
(bench.py train_audio_s_per_s); features + SpecAugment run ON DEVICE
inside the step, so the host pipeline only has to decode audio, tokenize,
bucket-pad and collate.  This script measures that host-side rate on a
synthetic LibriSpeech-layout corpus of 14 s utterances (the bench's
training shape) and prints audio-seconds ingested per wall-clock second.

  python -m scripts.bench_loader [--n 256] [--seconds 14] [--flac]

The result is recorded in VALIDATION.md — the loader must stay a healthy
multiple of the train step's consumption rate or the chip starves
(SURVEY.md §7 hard-parts #6).
"""

import argparse
import os
import tempfile
import time

import numpy as np


def make_corpus(root, n, seconds, sr=16000):
    from edgedict_tpu.data.audio_io import save_wav
    rng = np.random.RandomState(0)
    spk, chap = '1', '2'
    d = os.path.join(root, spk, chap)
    os.makedirs(d, exist_ok=True)
    words = ['alpha', 'bravo', 'charlie', 'delta', 'echo', 'foxtrot']
    lines = []
    t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
    for i in range(n):
        name = f'{spk}-{chap}-{i:04d}'
        audio = (0.2 * np.sin(2 * np.pi * (120 + 7 * (i % 40)) * t)
                 + 0.05 * rng.randn(len(t)))
        save_wav(os.path.join(d, name + '.wav'), audio, sr)
        text = ' '.join(words[(i + j) % len(words)] for j in range(12))
        lines.append(f'{name} {text.upper()}')
    with open(os.path.join(d, f'{spk}-{chap}.trans.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')


def make_flac_corpus(root, n, src='/root/reference/3729-6852-0035.flac'):
    """Corpus of real FLAC files (copies of the reference's bundled
    LibriSpeech utterance, 20.65 s each) — measures the DECODE-bound path
    a real LibriSpeech run hits."""
    import shutil
    from edgedict_tpu.native import read_flac
    audio, sr = read_flac(src)
    seconds = len(audio) / sr
    spk, chap = '1', '2'
    d = os.path.join(root, spk, chap)
    os.makedirs(d, exist_ok=True)
    lines = []
    for i in range(n):
        name = f'{spk}-{chap}-{i:04d}'
        shutil.copy(src, os.path.join(d, name + '.flac'))
        lines.append(f'{name} SOME TRANSCRIPT WORDS HERE')
    with open(os.path.join(d, f'{spk}-{chap}.trans.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return seconds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--seconds', type=float, default=14.0)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--codec', choices=['wav', 'flac'], default='wav')
    ap.add_argument('--workers', type=int, default=None)
    args = ap.parse_args()

    from edgedict_tpu.data import DataLoader, Librispeech
    from edgedict_tpu.data.collate import BucketSpec
    from edgedict_tpu.tokenizer import CharTokenizer

    with tempfile.TemporaryDirectory() as root:
        if args.codec == 'flac':
            args.seconds = make_flac_corpus(root, args.n)
        else:
            make_corpus(root, args.n, args.seconds)
        tok = CharTokenizer(cache_dir=os.path.join(root, 'tok'))
        ds = Librispeech(root, tokenizer=tok, transform=None,
                         audio_max_length=999)
        tok.build(ds.texts())
        bucket = BucketSpec(t_multiple=16000, u_multiple=16)
        loader = DataLoader(ds, batch_size=args.batch, bucket=bucket,
                            audio_key='audio', workers=args.workers)

        # warm epoch: builds the index cache, touches every file once
        n_items = 0
        for batch in loader:
            n_items += batch['audio'].shape[0]

        t0 = time.time()
        total_items = 0
        for _ in range(args.epochs):
            loader.epoch += 1
            for batch in loader:
                total_items += batch['audio'].shape[0]
        wall = time.time() - t0
        audio_s = total_items * args.seconds
        print(f'loader: {total_items} utts x {args.seconds:.0f}s in '
              f'{wall:.2f}s -> {audio_s / wall:.0f} audio-s/s '
              f'({total_items / wall:.1f} utts/s, batch={args.batch})')


if __name__ == '__main__':
    main()
