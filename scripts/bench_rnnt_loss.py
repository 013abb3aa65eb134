"""Measure the RNN-T loss cores on chip: associative-scan vs Pallas.

E6D2-scale lattice (B=8, T=192, U=60 — reference flagfiles/E6D2.txt after
downsample×3 + TimeReduction×2 on a ~14 s utterance).  Times forward and
forward+backward (grad w.r.t. both transition tensors) for both cores.

  python -m scripts.bench_rnnt_loss [--B 8 --T 192 --U 60]
"""

import argparse
import time

import numpy as np


def chain_time(step, x0, lo=3, hi=13, reps=3):
    """Per-call device time by slope: time chains of `lo` and `hi` calls
    (each consuming the previous output, one tiny host fetch at the end)
    and divide the difference — robust to the axon tunnel's ~26 ms
    dispatch/fetch floor, which otherwise dominates naive loops."""
    import numpy as np

    def run(n):
        x = x0
        t0 = time.time()
        for _ in range(n):
            x = step(x)
        np.asarray(x).ravel()[:1]
        return time.time() - t0

    run(2)  # warmup/compile
    t_lo = min(run(lo) for _ in range(reps))
    t_hi = min(run(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo) * 1e3


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
        # chained steps: output feeds the next input so every call does
        # real dependent work (fwd chains the loss back into the lps; bwd
        # chains a tiny grad step)
        fwd = jax.jit(lambda b, c=core:
                      b + 0.0 * c(b, label_lp, xlen, ylen).sum())
        g_fn = jax.grad(lambda b, l, c=core: c(b, l, xlen, ylen).sum())
        g = jax.jit(lambda b, c=core: b - 1e-6 * g_fn(b, label_lp))
        t_f = chain_time(fwd, blank_lp)
        t_g = chain_time(g, blank_lp)
        print(f'{name}  B={B} T={T} U={U}: fwd {t_f:7.3f} ms   '
              f'fwd+bwd {t_g:7.3f} ms')

    # parity guard while benchmarking.  Tolerance 1e-3: at T=192 the two
    # cores sum the same log-semiring terms in different association
    # orders (tree reduction vs sequential doubling), giving ~6e-4 max
    # divergence on O(1) occupancy grads — fp32 rounding, not a bug
    # (small-T tests in tests/test_rnnt_loss_pallas.py agree to 1e-5).
    l_s = rnnt_loss_core(blank_lp, label_lp, xlen, ylen)
    l_p = rnnt_loss_core_pallas(blank_lp, label_lp, xlen, ylen)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_s),
                               rtol=1e-3, atol=1e-3)
    g_s = jax.grad(lambda b, l: rnnt_loss_core(b, l, xlen, ylen).sum(),
                   argnums=(0, 1))(blank_lp, label_lp)
    g_p = jax.grad(
        lambda b, l: rnnt_loss_core_pallas(b, l, xlen, ylen).sum(),
        argnums=(0, 1))(blank_lp, label_lp)
    for a, b in zip(g_s, g_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
    print('parity OK')


if __name__ == '__main__':
    main()
