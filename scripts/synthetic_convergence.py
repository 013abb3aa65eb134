"""Synthetic-language convergence check: train a small transducer on a
tone-word language and measure held-out WER.

Each "word" is a fixed 2-tone audio pattern; utterances are 3–6 random
words.  A model that truly learns the ASR mapping (not memorization —
eval utterances are unseen word sequences) should drive held-out WER
toward 0.  Run on TPU or CPU:

  python -m scripts.synthetic_convergence [--steps 400]
"""

import argparse
import sys

import numpy as np

SR = 16000
WORDS = {
    'ba': (300, 500), 'ko': (400, 700), 'mi': (550, 900),
    'ta': (650, 1100), 'zu': (800, 1300), 'pe': (950, 1500),
    'ra': (1100, 1800), 'no': (1300, 2100), 'si': (1500, 2400),
    'du': (1700, 2800),
}
TONE_SEC = 0.08


def synth(words, rng):
    audio = []
    for w in words:
        for f in WORDS[w]:
            t = np.arange(int(SR * TONE_SEC)) / SR
            amp = 0.3 + 0.1 * rng.rand()
            audio.append(amp * np.sin(2 * np.pi * f * t))
        audio.append(np.zeros(int(SR * 0.02)))
    x = np.concatenate(audio)
    return (x + 0.02 * rng.randn(len(x))).astype(np.float32)


class ToyCorpus:
    tokenizer = None

    def __init__(self, tokenizer, n, seed):
        rng = np.random.RandomState(seed)
        names = list(WORDS)
        self.samples = []
        self.data = []
        self.tokenizer = tokenizer
        for _ in range(n):
            words = [names[rng.randint(len(names))]
                     for _ in range(rng.randint(3, 7))]
            text = ' '.join(words)
            audio = synth(words, rng)
            self.samples.append((audio, text))
            self.data.append({'audio_length': len(audio) / SR,
                              'text': text})

    def texts(self):
        return [t for _, t in self.samples]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        audio, text = self.samples[i]
        toks = np.asarray(self.tokenizer.encode(text), np.int32)
        return audio, toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=400)
    ap.add_argument('--logdir', default='/tmp/edgedict_synth')
    args = ap.parse_args()

    from edgedict_tpu.config import FLAGS, ensure_parsed
    ensure_parsed(['synth'])
    FLAGS.name = 'synth'
    FLAGS.logdir_root = args.logdir
    FLAGS.tokenizer = 'char'
    FLAGS.batch_size = 16
    FLAGS.sub_batch_size = 16
    FLAGS.eval_batch_size = 8
    FLAGS.lr = 3e-3
    FLAGS.warmup_step = 40
    FLAGS.gradclip = 5.0
    FLAGS.enc_hidden_size = 128
    FLAGS.enc_layers = 3
    FLAGS.enc_proj_size = 128
    FLAGS.dec_hidden_size = 64
    FLAGS.dec_layers = 1
    FLAGS.dec_proj_size = 64
    FLAGS.joint_size = 128
    FLAGS.vocab_embed_size = 16
    FLAGS.feature = 'logfbank'
    FLAGS.feature_size = 40
    FLAGS.n_fft = 400
    FLAGS.win_length = 400
    FLAGS.hop_length = 160
    FLAGS.downsample = 2
    FLAGS.audio_bucket_frames = 32
    FLAGS.loss_step = 20
    FLAGS.save_step = 10 ** 9
    FLAGS.eval_step = 10 ** 9
    FLAGS.dp_size = 1
    FLAGS.tp_size = 1

    from edgedict_tpu.tokenizer import CharTokenizer
    import os
    os.makedirs(os.path.join(args.logdir, 'char'), exist_ok=True)
    tok = CharTokenizer(cache_dir=os.path.join(args.logdir, 'char'))
    train_set = ToyCorpus(tok, 256, seed=0)
    eval_set = ToyCorpus(tok, 48, seed=1)
    tok.build(train_set.texts())

    from edgedict_tpu.trainer import Trainer
    trainer = Trainer(FLAGS, train_datasets=[train_set],
                      eval_dataset=eval_set)

    step = 0
    while step < args.steps:
        for batch in trainer.loader:
            m = trainer.run_step(batch)
            step = int(trainer.state.step)
            if step % 50 == 0:
                print(f'step {step} loss {float(m["loss"]):.3f}',
                      flush=True)
            if step >= args.steps:
                break
    loss, wer = trainer.evaluate()
    print(f'FINAL held-out: loss {loss:.3f} WER {wer:.4f}')
    return 0 if wer < 0.3 else 1


if __name__ == '__main__':
    sys.exit(main())
