"""Experiment 2: k timesteps per grid block, measured with DEVICE-CHAINED
iterations (lax.fori_loop feeding the kernel's output back into its own
h0), so per-iteration time is independent of the axon tunnel's dispatch
jitter: one dispatch per timing, slope over the in-jit iteration count.

  python -m scripts.exp_lstm_kblock2
"""

import functools
import time

import numpy as np


def timed(fn, *args, reps=5):
    import jax
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, H = 32, 368, 1024
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(T, B, 4 * H) * 0.1, jnp.float32)
    whh = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    # device-chained canary: N dependent 4096^3 matmuls inside one jit
    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)

    def mm_chain(n):
        @jax.jit
        def f(x):
            def body(i, y):
                return jnp.tanh(y @ a)
            return jax.lax.fori_loop(0, n, body, x)
        return f

    t8 = timed(mm_chain(8), a)
    t64 = timed(mm_chain(64), a)
    per = (t64 - t8) / 56 * 1e3
    print(f'canary: device-chained 4096^3 matmul {per:.3f} ms '
          f'(expect ~0.73 + tanh)')

    def cell(gates, c):
        hd = c.shape[-1]
        i = jax.nn.sigmoid(gates[:, :hd])
        f = jax.nn.sigmoid(gates[:, hd:2 * hd])
        g = jnp.tanh(gates[:, 2 * hd:3 * hd])
        o = jax.nn.sigmoid(gates[:, 3 * hd:])
        c = f * c + i * g
        return o * jnp.tanh(c), c

    def kernel_k(xp_ref, whh_ref, h0_ref, c0_ref, ys_ref,
                 hT_ref, cT_ref, h_s, c_s, *, k):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_s[:, :] = h0_ref[:, :]
            c_s[:, :] = c0_ref[:, :]

        h = h_s[:, :]
        c = c_s[:, :]
        for j in range(k):
            gates = xp_ref[j] + jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:, :],
                preferred_element_type=jnp.float32)
            h, c = cell(gates, c)
            ys_ref[j] = h
        h_s[:, :] = h
        c_s[:, :] = c
        hT_ref[:, :] = h
        cT_ref[:, :] = c

    def make_pallas(k):
        return pl.pallas_call(
            functools.partial(kernel_k, k=k),
            grid=(T // k,),
            in_specs=[
                pl.BlockSpec((k, B, 4 * H), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k, B, H), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                jax.ShapeDtypeStruct((B, H), jnp.float32),
                jax.ShapeDtypeStruct((B, H), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                            pltpu.VMEM((B, H), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    def chained(k, n):
        p = make_pallas(k)

        @jax.jit
        def f(xp, whh, h0, c0):
            def body(i, carry):
                h, c = carry
                ys, hT, cT = p(xp, whh, h, c)
                return hT, cT
            hT, cT = jax.lax.fori_loop(0, n, body, (h0, c0))
            return hT

        return f

    ref = None
    for k in (1, 2, 4, 8, 16):
        try:
            # correctness once
            p = make_pallas(k)
            ys, hT, cT = jax.jit(lambda *a: p(*a))(xp, whh, h0, c0)
            ys = np.asarray(ys)
            if ref is None:
                ref = ys
            else:
                np.testing.assert_allclose(ys, ref, atol=2e-2)
            lo, hi = 4, 16
            t_lo = timed(chained(k, lo), xp, whh, h0, c0)
            t_hi = timed(chained(k, hi), xp, whh, h0, c0)
            ms = (t_hi - t_lo) / (hi - lo) * 1e3
            print(f'k={k:2d}: {ms:7.3f} ms/recurrence '
                  f'({ms / T * 1e3:.2f} us/step)')
        except Exception as e:
            print(f'k={k:2d}: FAILED {type(e).__name__}: {str(e)[:160]}')


if __name__ == '__main__':
    main()
