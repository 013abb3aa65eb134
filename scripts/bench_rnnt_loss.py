"""Measure the RNN-T loss cores on chip: associative-scan vs Pallas.

E6D2-scale lattice (B=8, T=192, U=60 — reference flagfiles/E6D2.txt after
downsample×3 + TimeReduction×2 on a ~14 s utterance).  Times forward and
forward+backward (grad w.r.t. both transition tensors) for both cores.

  python -m scripts.bench_rnnt_loss [--B 8 --T 192 --U 60]
"""

import argparse
import time

import numpy as np


def timeit(fn, *args, warmup=2, iters=20):
    for _ in range(warmup):
        out = fn(*args)
    import jax
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--B', type=int, default=8)
    ap.add_argument('--T', type=int, default=192)
    ap.add_argument('--U', type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss_core
    from edgedict_tpu.ops.rnnt_loss_pallas import rnnt_loss_core_pallas

    B, T, U = args.B, args.T, args.U
    rng = np.random.RandomState(0)
    blank_lp = jnp.asarray(rng.randn(B, T, U + 1).astype(np.float32) - 1.0)
    label_lp = jnp.asarray(rng.randn(B, T, U).astype(np.float32) - 1.0)
    xlen = jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32)
    ylen = jnp.asarray(rng.randint(U // 2, U + 1, (B,)), jnp.int32)

    for name, core in (('scan  ', rnnt_loss_core),
                       ('pallas', rnnt_loss_core_pallas)):
        fwd = jax.jit(lambda b, l, c=core: c(b, l, xlen, ylen).sum())
        g = jax.jit(jax.grad(
            lambda b, l, c=core: c(b, l, xlen, ylen).sum(), argnums=(0, 1)))
        t_f = timeit(fwd, blank_lp, label_lp)
        t_g = timeit(g, blank_lp, label_lp)
        print(f'{name}  B={B} T={T} U={U}: fwd {t_f:7.3f} ms   '
              f'fwd+bwd {t_g:7.3f} ms')

    # parity guard while benchmarking
    l_s = rnnt_loss_core(blank_lp, label_lp, xlen, ylen)
    l_p = rnnt_loss_core_pallas(blank_lp, label_lp, xlen, ylen)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_s),
                               rtol=1e-4, atol=1e-4)
    g_s = jax.grad(lambda b, l: rnnt_loss_core(b, l, xlen, ylen).sum(),
                   argnums=(0, 1))(blank_lp, label_lp)
    g_p = jax.grad(
        lambda b, l: rnnt_loss_core_pallas(b, l, xlen, ylen).sum(),
        argnums=(0, 1))(blank_lp, label_lp)
    for a, b in zip(g_s, g_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
    print('parity OK')


if __name__ == '__main__':
    main()
