"""Raw-waveform RNN-T trainer CLI (reference `python -m cli.train`,
/root/reference/cli/train.py): trainable conv FrontEnd instead of spectral
features, optional wav2vec-pretrained initialization.

  python -m cli.train --flagfile ... [--use_pretrained]
"""

import os

from absl import app

from edgedict_tpu.pretrain_config import FLAGS  # full flag surface


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from edgedict_tpu.raw_trainer import RawTrainer

    trainer = RawTrainer(FLAGS)
    if FLAGS.use_pretrained:
        path = os.path.join(FLAGS.logdir_root, FLAGS.name,
                            'pretrained.ckpt')
        trainer.load_pretrained(path)
        print(f'initialized frontend+encoder from {path}')
    if FLAGS.mode == 'resume':
        step = trainer.load(FLAGS.resume_step)
        print(f'resumed from step {step}')
    if FLAGS.mode == 'eval':
        trainer.load(FLAGS.resume_step)
        loss, wer = trainer.evaluate()
        print(f'val_loss {loss:.4f} WER {wer:.4f}')
        return
    trainer.train()


if __name__ == '__main__':
    app.run(main)
