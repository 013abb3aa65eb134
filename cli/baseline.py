"""Feature-based RNN-T trainer CLI (the reference `python -m cli.baseline`,
/root/reference/cli/baseline.py).

Modes (reference cli/baseline.py:326-351):
  --mode=train        fresh run; snapshots flags to logs/<name>/flagfile.txt
  --mode=resume       reload logs/<name>/models/<resume_step or latest>.ckpt
  --mode=eval         one evaluation pass (loss + WER) and exit
  --mode=device_rate  (tpu-native extra) measure the DEVICE-only step rate
                      of this exact config: one real batch from the loader,
                      re-fed for a few hundred steps — the ceiling the data
                      pipeline must keep up with (soak loader-efficiency
                      denominator, scripts/soak_train.py)
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
    if FLAGS.mode == 'device_rate':
        import time
        batch = next(iter(trainer.loader))
        trainer.run_step(batch)                    # compile + warmup
        float(trainer.state.step)                  # sync
        n = 100
        t0 = time.time()
        for _ in range(n):
            m = trainer.run_step(batch)
        float(m['loss'])                           # one sync fetch
        step_ms = (time.time() - t0) / n * 1e3
        audio_s = float(batch['alen'].sum()) / 16000.0
        print(f'device_rate: step_ms {step_ms:.2f} '
              f'batch_audio_s {audio_s:.1f} '
              f'audio_s_per_s {audio_s / (step_ms / 1e3):.1f}')
        return
    trainer.train()


if __name__ == '__main__':
    app.run(main)
