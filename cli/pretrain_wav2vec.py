"""wav2vec 2.0 pretraining CLI (reference cli/pretrain_wav2vec.py).

  python -m cli.pretrain_wav2vec --LibriSpeech_train_360 ... [flags]

Trains the contrastive model on raw audio, logging loss / accuracy /
perplexity / temperature, keeping the best-accuracy checkpoint at
logs/<name>/pretrained.ckpt for the fine-tune splice in cli.train.
"""

import numpy as np
from absl import app

from edgedict_tpu.pretrain_config import FLAGS


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from edgedict_tpu.data import DataLoader
    from edgedict_tpu.pretrainer import Wav2VecPretrainer
    from edgedict_tpu.tokenizer import CharTokenizer
    from edgedict_tpu.trainer import build_datasets

    class _NullTok(CharTokenizer):
        def __init__(self):
            super().__init__(cache_dir='.')
            self.token2id = {}
            self.id2token = []
            self.vocab_size = 0

        def encode(self, text, max_length=None):
            return []

    tok = _NullTok()
    train_sets, eval_set = build_datasets(FLAGS, tok)
    assert train_sets, 'no training corpora found at the flag paths'
    from edgedict_tpu.data import MergedDataset
    train = MergedDataset(train_sets)

    pretrainer = Wav2VecPretrainer(FLAGS, train, eval_set)
    loader = DataLoader(train, FLAGS.batch_size, shuffle=True,
                        collate_fn=pretrainer.make_batch)

    step = 0
    for epoch in range(FLAGS.epochs):
        for batch in loader:
            metrics = pretrainer.run_step(batch)
            step = pretrainer.host_step
            if step % FLAGS.loss_step == 0:
                acc = float(metrics.get('correct', 0)) / max(
                    float(metrics.get('count', 1)), 1)
                print(f'epoch {epoch} step {step} '
                      f'loss {float(metrics["loss"]):.4f} acc {acc:.4f} '
                      f'ppl {float(metrics.get("prob_perplexity", 0)):.1f}')
            if step % FLAGS.eval_iteration == 0:
                ev = pretrainer.evaluate()
                if ev is not None:
                    print(f'eval @ {step}: acc {ev["accuracy"]:.4f} '
                          f'loss {ev["loss"]:.4f}')
                    pretrainer.save_best(ev['accuracy'])
                else:   # no eval corpus: fall back to train accuracy
                    acc = float(metrics.get('correct', 0)) / max(
                        float(metrics.get('count', 1)), 1)
                    pretrainer.save_best(acc)
    pretrainer.save_best(-0.5)  # always leave a final checkpoint


if __name__ == '__main__':
    app.run(main)
