"""E6D2 train-step tuning sweep on chip: joint remat time_chunk, batch.

Times the full train step (fwd+bwd+adam, bf16) with chained slope timing
(see VALIDATION.md §3) across rnnt_loss_from_joint time_chunk values and
batch sizes, printing ms/step + MFU for each.

  python -m scripts.bench_train_step [--batch 16] [--chunks 16,32,64,128]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--chunks', type=str, default='16,24,32,64')
    ap.add_argument('--utt_seconds', type=float, default=14.0)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from scripts.profile_train_step import _enable_cache
    _enable_cache()

    import edgedict_tpu.models.transducer as TT
    from bench import PEAK_FLOPS, transducer_fwd_flops
    from edgedict_tpu import optim
    from edgedict_tpu.ops import rnnt_loss as RL
    from edgedict_tpu.parallel import make_train_state, make_train_step

    cfg = TT.TransducerConfig(
        vocab_size=2048, vocab_embed_size=64, input_size=240,
        enc_hidden_size=1024, enc_layers=6, enc_proj_size=640,
        dec_hidden_size=256, dec_layers=2, dec_proj_size=256,
        joint_size=640, enc_time_reductions=(1,))
    B = args.batch
    t_ds = int(args.utt_seconds * 16000 - 320) // 200 + 1
    t_ds = t_ds // 3
    t_ds -= t_ds % 4
    u = 60
    rng = np.random.RandomState(0)
    batch = {
        'xs': jnp.asarray(rng.randn(1, B, t_ds, cfg.input_size),
                          jnp.float32),
        'xlen': jnp.full((1, B), t_ds, jnp.int32),
        'ys': jnp.asarray(rng.randint(4, cfg.vocab_size, (1, B, u)),
                          jnp.int32),
        'ylen': jnp.full((1, B), u, jnp.int32),
    }
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 275e12)
    fwd, joint_out = transducer_fwd_flops(cfg, B, t_ds, u + 1)
    train_flops = 3 * fwd + joint_out

    orig = RL.rnnt_loss_from_joint

    for chunk in [int(c) for c in args.chunks.split(',')]:
        def patched(*a, time_chunk=24, _c=chunk, **kw):
            return orig(*a, time_chunk=_c, **kw)
        RL.rnnt_loss_from_joint = patched
        # transducer.py imports the symbol at call time from the module
        opt = optim.build_optimizer('adam', lr=1e-3, gradclip=10.0)
        state = make_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = make_train_step(cfg, opt, mesh=None, bf16=True)
        key = jax.random.PRNGKey(1)
        lr = jnp.asarray(1e-3)
        state, m = step(state, batch, key, lr)
        float(m['loss'])

        def run_n(n, st):
            t0 = time.time()
            for _ in range(n):
                st, mm = step(st, batch, key, lr)
            float(mm['loss'])
            return (time.time() - t0), st
        lo, state = run_n(3, state)
        lo2, state = run_n(3, state)
        hi, state = run_n(13, state)
        hi2, state = run_n(13, state)
        sec = (min(hi, hi2) - min(lo, lo2)) / 10
        print(f'time_chunk={chunk:4d}: {sec*1e3:7.2f} ms/step  '
              f'MFU {train_flops/sec/peak:6.1%}  '
              f'({B*args.utt_seconds/sec:6.0f} audio-s/s)', flush=True)
    RL.rnnt_loss_from_joint = orig


if __name__ == '__main__':
    main()
