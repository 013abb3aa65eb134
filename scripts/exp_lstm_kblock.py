"""Experiment: k timesteps per grid block in the LSTM recurrence kernel,
and a VMEM-budget probe for a 2-layer wavefront (weights resident).

  python -m scripts.exp_lstm_kblock
"""

import functools
import time

import numpy as np


def chain_time(fn, args, lo=20, hi=120, reps=5):
    """Long chains (100-call delta): the axon tunnel's latency variance
    swamps short chains — a bare-matmul canary slope-timed NEGATIVE with
    the default 3-vs-13 chains this session, and converges to ~0.77 ms
    with 20-vs-120."""
    import jax

    def run(n):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.time() - t0

    run(5)
    t_lo = min(run(lo) for _ in range(reps))
    t_hi = min(run(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng0 = np.random.RandomState(7)
    a = jnp.asarray(rng0.randn(4096, 4096), jnp.bfloat16)
    b = jnp.asarray(rng0.randn(4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda x, y: (x @ y).astype(jnp.bfloat16))
    ms = chain_time(lambda x: mm(x, b), (a,))
    print(f'canary (long-chain): {ms:.3f} ms (expect ~0.73-0.8)')

    B, T, H = 32, 368, 1024
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(T, B, 4 * H) * 0.1, jnp.float32)
    whh = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    def cell(gates, c):
        hd = c.shape[-1]
        i = jax.nn.sigmoid(gates[:, :hd])
        f = jax.nn.sigmoid(gates[:, hd:2 * hd])
        g = jnp.tanh(gates[:, 2 * hd:3 * hd])
        o = jax.nn.sigmoid(gates[:, 3 * hd:])
        c = f * c + i * g
        return o * jnp.tanh(c), c

    def kernel_k(xp_ref, whh_ref, h0_ref, c0_ref, ys_ref, h_s, c_s, *, k):
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

    def run_k(k):
        f = pl.pallas_call(
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
            out_specs=pl.BlockSpec((k, B, H), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                            pltpu.VMEM((B, H), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return jax.jit(lambda *a: f(*a))

    ref = None
    for k in (1, 2, 4, 8, 16):
        try:
            fn = run_k(k)
            ys = fn(xp, whh, h0, c0)
            ys.block_until_ready()
            if ref is None:
                ref = np.asarray(ys)
            else:
                np.testing.assert_allclose(np.asarray(ys), ref, atol=2e-2)
            ms = chain_time(fn, (xp, whh, h0, c0))
            print(f'k={k:2d}: {ms:7.3f} ms  ({ms / T * 1e3:.2f} us/step)')
        except Exception as e:
            print(f'k={k:2d}: FAILED {type(e).__name__}: {str(e)[:200]}')

    # --- VMEM probe: 2-layer wavefront working set (2*whh + wx resident) ---
    wx = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)
    whh2 = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)

    def wf_kernel(xp_ref, whh_ref, wx_ref, whh2_ref,
                  h0_ref, c0_ref, ys_ref, h_s, c_s, h2_s, c2_s, f_s):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_s[:, :] = h0_ref[:, :]
            c_s[:, :] = c0_ref[:, :]
            h2_s[:, :] = h0_ref[:, :]
            c2_s[:, :] = c0_ref[:, :]
            f_s[:, :] = jnp.zeros_like(f_s)

        # layer 1 cell at t
        h = h_s[:, :]
        c = c_s[:, :]
        gates = xp_ref[0] + jnp.dot(h.astype(whh_ref.dtype), whh_ref[:, :],
                                    preferred_element_type=jnp.float32)
        h, c = cell(gates, c)
        h_s[:, :] = h
        c_s[:, :] = c
        # layer 2 cell at t-1 (consumes staged feed)
        feed = f_s[:, :]
        h2 = h2_s[:, :]
        c2 = c2_s[:, :]
        g2 = (jnp.dot(feed.astype(wx_ref.dtype), wx_ref[:, :],
                      preferred_element_type=jnp.float32)
              + jnp.dot(h2.astype(whh2_ref.dtype), whh2_ref[:, :],
                        preferred_element_type=jnp.float32))
        h2, c2 = cell(g2, c2)
        h2_s[:, :] = h2
        c2_s[:, :] = c2
        f_s[:, :] = h
        ys_ref[0] = h2

    try:
        f = pl.pallas_call(
            wf_kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)
                            for _ in range(5)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        fn = jax.jit(lambda *a: f(*a))
        ys = fn(xp, whh, wx, whh2, h0, c0)
        ys.block_until_ready()
        ms = chain_time(fn, (xp, whh, wx, whh2, h0, c0))
        print(f'wavefront-2L probe (24MB resident): OK  {ms:7.3f} ms '
              f'({ms / T * 1e3:.2f} us/wavefront-step, 2 cells/step)')
    except Exception as e:
        print(f'wavefront-2L probe: FAILED {type(e).__name__}: '
              f'{str(e)[:300]}')


if __name__ == '__main__':
    main()
