"""Feature-based RNN-T trainer CLI (the reference `python -m cli.baseline`,
/root/reference/cli/baseline.py).

Modes (reference cli/baseline.py:326-351):
  --mode=train   fresh run; snapshots flags to logs/<name>/flagfile.txt
  --mode=resume  reload logs/<name>/models/<resume_step or latest>.ckpt
  --mode=eval    one evaluation pass (loss + WER) and exit
"""

from absl import app, flags

from edgedict_tpu.config import FLAGS  # registers the shared flag surface


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax
    print(f'devices: {jax.devices()}')
    from edgedict_tpu.trainer import Trainer

    trainer = Trainer(FLAGS)
    if FLAGS.mode == 'resume':
        step = trainer.load(FLAGS.resume_step)
        print(f'resumed from step {step}')
    if FLAGS.mode == 'eval':
        trainer.load(FLAGS.resume_step)
        loss, wer = trainer.evaluate()
        beam = (f' beam_WER {trainer.last_beam_wer:.4f}'
                if trainer.last_beam_wer is not None else '')
        print(f'val_loss {loss:.4f} WER {wer:.4f}{beam}')
        return
    trainer.train()


if __name__ == '__main__':
    app.run(main)
