"""Op-level device-time breakdown of the E6D2 train step on chip.

Captures a jax.profiler trace of a few steady-state steps and aggregates
per-op device durations from the xplane (jax.profiler.ProfileData — no
tensorboard needed), grouped into the categories that drove the round-3
rework: Pallas kernels (joint+LSE, LSTM/GRU recurrence, lattice,
features), plain matmuls, elementwise fusions, copies/transposes, and
everything else.  This is the measurement tool behind the profile-driven
glue ladder (VALIDATION.md §3): find the out-of-kernel HBM glue, fix it,
re-run, keep the A/B in one session.

  python -m scripts.trace_train_step [--batch 64] [--steps 4] [--top 25]
"""

import argparse
import collections
import glob
import os
import tempfile
import time

import numpy as np


def _enable_cache():
    import jax
    try:
        cache = os.path.expanduser('~/.cache/edgedict_tpu_xla')
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass


def categorize(name):
    n = name.lower()
    if 'custom-call' in n or 'tpu_custom_call' in n or 'pallas' in n:
        return 'pallas/custom-call'
    if n.startswith('fusion') or '.fusion' in n or 'loop_fusion' in n \
            or 'input_fusion' in n:
        return 'fusion (elementwise glue)'
    if 'dot' in n or 'convolution' in n or 'matmul' in n:
        return 'matmul'
    if 'copy' in n or 'transpose' in n or 'reshape' in n \
            or 'bitcast' in n or 'concatenate' in n or 'slice' in n:
        return 'copy/layout'
    if 'all-reduce' in n or 'all-gather' in n or 'reduce-scatter' in n \
            or 'collective' in n:
        return 'collective'
    return 'other'


def device_op_events(trace_dir):
    """[(op_name, duration_us)] from every device plane of the newest
    xplane capture under trace_dir."""
    import jax

    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.xplane.pb'), recursive=True))
    assert paths, f'no xplane capture under {trace_dir}'
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[-1], 'rb').read())
    events = []
    for plane in data.planes:
        pname = plane.name.lower()
        if 'tpu' not in pname or 'host' in pname:
            continue
        for line in plane.lines:
            # ONLY the 'XLA Ops' line: it tiles the module time exactly.
            # 'Steps'/'XLA Modules' are aggregates (double counting) and
            # 'Async XLA Ops' durations overlap real compute (their sum
            # exceeds wall time)
            if line.name != 'XLA Ops':
                continue
            for ev in line.events:
                events.append((ev.name, ev.duration_ns / 1e3))
    return events


def report(events, n_steps, top=25):
    by_op = collections.Counter()
    for name, us in events:
        by_op[name] += us
    by_cat = collections.Counter()
    for name, us in by_op.items():
        by_cat[categorize(name)] += us
    total = sum(by_op.values())
    print(f'\ntotal device op time: {total / 1e3:.2f} ms over {n_steps} '
          f'steps = {total / 1e3 / max(n_steps, 1):.2f} ms/step')
    print('\nby category (ms/step):')
    for cat, us in by_cat.most_common():
        print(f'  {cat:28s} {us / 1e3 / max(n_steps, 1):8.3f} '
              f'({100 * us / total:5.1f}%)')
    print(f'\ntop {top} ops (ms/step):')
    for name, us in by_op.most_common(top):
        print(f'  {us / 1e3 / max(n_steps, 1):8.3f}  {name[:110]}')


def main():
    import jax
    import jax.numpy as jnp

    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--steps', type=int, default=4)
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--utt_seconds', type=float, default=14.0)
    ap.add_argument('--trace_dir', default=None)
    args = ap.parse_args()

    from edgedict_tpu.models import transducer as T

    cfg = T.TransducerConfig(
        vocab_size=2048, vocab_embed_size=64, input_size=240,
        enc_hidden_size=1024, enc_layers=6, enc_proj_size=640,
        dec_hidden_size=256, dec_layers=2, dec_proj_size=256,
        joint_size=640, enc_time_reductions=(1,))
    B, u = args.batch, 60
    n_frames = int(args.utt_seconds * 16000 - 320) // 200 + 1
    t_ds = (n_frames // 3) - (n_frames // 3) % 4
    rng = np.random.RandomState(0)
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)
    xs = jnp.asarray(rng.randn(B, t_ds, cfg.input_size), jnp.bfloat16)
    ys = jnp.asarray(rng.randint(4, cfg.vocab_size, (B, u)), jnp.int32)
    xlen = jnp.full((B,), t_ds, jnp.int32)
    ylen = jnp.full((B,), u, jnp.int32)

    @jax.jit
    def step(p):
        return jax.grad(
            lambda p: T.transducer_loss(p, cfg, xs, ys, xlen, ylen))(p)

    # steady state before tracing
    g = step(params)
    np.asarray(jax.tree.leaves(g)[0]).ravel()[:1]

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix='edgedict_trace_')
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        o = None
        for _ in range(args.steps):
            o = step(params)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
    wall = (time.time() - t0) / args.steps * 1e3
    print(f'traced {args.steps} steps at B={B}, T\'={t_ds}: '
          f'{wall:.2f} ms/step wall (incl. one fetch)')
    report(device_op_events(trace_dir), args.steps, args.top)
    print(f'\ntrace dir: {trace_dir}')


if __name__ == '__main__':
    main()
