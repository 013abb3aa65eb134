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
        import jax.numpy as jnp
        from edgedict_tpu.parallel import shard_batch
        batch = next(iter(trainer.loader))
        # pre-place ONE batch on device and re-feed the DEVICE arrays —
        # calling run_step(host_batch) in the loop would re-upload the
        # ~29 MB of audio every iteration and measure the tunnel's H2D,
        # not the device step (that mistake made round 5's first probe
        # read 1479 ms for a 125 ms step)
        if trainer._device_corpus is not None and 'idx' in batch:
            import numpy as np
            import jax
            idx = np.asarray(batch['idx']).reshape(trainer.accum_steps, -1)
            sharded = trainer._gather(
                trainer._device_corpus,
                jax.device_put(idx, trainer._idx_sharding))
            audio_s = float(jnp.sum(sharded['alen'])) / 16000.0
        else:
            sharded = shard_batch(trainer.mesh, batch,
                                  trainer.accum_steps)
            audio_s = float(batch['alen'].sum()) / 16000.0
        rng = trainer._next_rng()
        lr = jnp.asarray(trainer._lr(0), jnp.float32)
        state, m = trainer.train_step(trainer.state, sharded, rng, lr)
        float(m['loss'])                           # compile + warmup
        n = 100
        t0 = time.time()
        for _ in range(n):
            state, m = trainer.train_step(state, sharded, rng, lr)
        float(m['loss'])                           # one sync fetch
        step_ms = (time.time() - t0) / n * 1e3
        print(f'device_rate: step_ms {step_ms:.2f} '
              f'batch_audio_s {audio_s:.1f} '
              f'audio_s_per_s {audio_s / (step_ms / 1e3):.1f}')
        return
    trainer.train()


if __name__ == '__main__':
    app.run(main)
