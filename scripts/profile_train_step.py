"""Component-level E6D2 train-step breakdown on chip (slope timing).

Times fwd+bwd of: encoder alone, decoder alone, the fused joint+lattice
loss alone (given fixed h_enc/h_dec), and the full loss — to show where
the step's 38 ms goes and what a fused Pallas joint+LSE kernel could save.

  python -m scripts.profile_train_step
"""

import time

import numpy as np


def chain_time(fn, args, lo=3, hi=13, reps=3):
    """Per-call device time by slope.  Calls are issued back-to-back with
    one VALUE fetch at the end (np.asarray of a leaf): the device executes
    them serially, so the lo→hi difference isolates per-call device time
    from the dispatch floor.  A value fetch — not block_until_ready — is
    load-bearing: the axon tunnel has been observed acknowledging
    block_until_ready before execution finishes (see harness_canary)."""
    import jax

    def run(n):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.time() - t0

    run(2)
    t_lo = min(run(lo) for _ in range(reps))
    t_hi = min(run(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo) * 1e3


def harness_canary(expect_ms=0.73, tol=0.25):
    """Validate the timing harness against physics before trusting any
    number it prints: a bare bf16 4096³ matmul takes ~0.73 ms at the v5e
    197 Tbf16/s peak.  A reading far off that bound means the tunnel is
    misbehaving (it has been observed dropping block_until_ready
    semantics and, after hangs, returning sub-physical timings) — every
    downstream measurement in that session is then suspect."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    b = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda x, y: (x @ y).astype(jnp.bfloat16))
    ms = chain_time(lambda x: mm(x, b), (a,))
    ok = abs(ms - expect_ms) / expect_ms <= tol
    verdict = 'OK' if ok else "SUSPECT: do not trust this session's timings"
    print(f'harness canary: 4096^3 matmul {ms:.3f} ms '
          f'(expect ~{expect_ms}) -> {verdict}')
    return ok


def _enable_cache():
    """Share bench.py's persistent XLA compile cache — the component
    variants here are expensive cold compiles on the tunnel."""
    import os
    import jax
    try:
        cache = os.path.expanduser('~/.cache/edgedict_tpu_xla')
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass


def main():
    import argparse
    import jax
    import jax.numpy as jnp

    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--parts', action='store_true',
                    help='also time the encoder sub-parts (recurrence '
                         'kernels vs input-projection matmuls)')
    args = ap.parse_args()

    harness_canary()

    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.ops.rnnt_loss import rnnt_loss_from_joint

    cfg = T.TransducerConfig(
        vocab_size=2048, vocab_embed_size=64, input_size=240,
        enc_hidden_size=1024, enc_layers=6, enc_proj_size=640,
        dec_hidden_size=256, dec_layers=2, dec_proj_size=256,
        joint_size=640, enc_time_reductions=(1,))
    B, t_ds, u = args.batch, 372, 60
    rng = np.random.RandomState(0)
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)
    xs = jnp.asarray(rng.randn(B, t_ds, cfg.input_size), jnp.bfloat16)
    ys = jnp.asarray(rng.randint(4, cfg.vocab_size, (B, u)), jnp.int32)
    xlen = jnp.full((B,), t_ds, jnp.int32)
    ylen = jnp.full((B,), u, jnp.int32)

    # component pieces at the shapes the full step produces
    h_enc, _ = jax.jit(lambda p, x: T.encoder_apply(p, cfg, x))(
        params['encoder'], xs)
    h_dec, _ = jax.jit(lambda p, y: T.decoder_apply(p, cfg, y))(
        params['decoder'], ys)
    t_red = h_enc.shape[1]
    xlen_s = jnp.full((B,), t_red, jnp.int32)

    @jax.jit
    def enc_fb(p, x):
        def f(p):
            h, _ = T.encoder_apply(p, cfg, x)
            return jnp.sum(h.astype(jnp.float32))
        return jax.grad(f)(p)

    @jax.jit
    def dec_fb(p, y):
        def f(p):
            h, _ = T.decoder_apply(p, cfg, y)
            return jnp.sum(h.astype(jnp.float32))
        return jax.grad(f)(p)

    @jax.jit
    def loss_only_fb(jp, he, hd):
        def f(jp, he, hd):
            return jnp.mean(rnnt_loss_from_joint(
                jp, he, hd, ys, xlen_s, ylen))
        return jax.grad(f, argnums=(0, 1, 2))(jp, he, hd)

    @jax.jit
    def full_fb(p):
        def f(p):
            return T.transducer_loss(p, cfg, xs, ys, xlen, ylen)
        return jax.grad(f)(p)

    enc_ms = chain_time(enc_fb, (params['encoder'], xs))
    dec_ms = chain_time(dec_fb, (params['decoder'], ys))
    loss_ms = chain_time(loss_only_fb, (params['joint'], h_enc, h_dec))
    full_ms = chain_time(full_fb, (params,))

    print(f'encoder fwd+bwd:          {enc_ms:7.2f} ms')
    print(f'decoder fwd+bwd:          {dec_ms:7.2f} ms')
    print(f'joint+lattice loss f+b:   {loss_ms:7.2f} ms '
          f'(h_enc {tuple(h_enc.shape)}, h_dec {tuple(h_dec.shape)})')
    print(f'full loss fwd+bwd:        {full_ms:7.2f} ms')

    if args.parts:
        from edgedict_tpu.ops.rnn_pallas import lstm_recurrence_pallas
        H = cfg.enc_hidden_size
        t_half = -(-t_ds // 2)
        layer_ts = [t_ds, t_ds] + [t_half] * (cfg.enc_layers - 2)

        for label, fb in (('fwd', False), ('fwd+bwd', True)):
            total = 0.0
            for li, t_l in enumerate(layer_ts):
                xp = jnp.asarray(rng.randn(B, t_l, 4 * H), jnp.float32)
                wt = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)
                h0 = jnp.zeros((B, H), jnp.float32)
                if fb:
                    fn = jax.jit(lambda xp, wt, h0: jax.grad(
                        lambda xp: jnp.sum(lstm_recurrence_pallas(
                            xp, wt, h0, h0)[0]))(xp))
                else:
                    fn = jax.jit(lambda xp, wt, h0: lstm_recurrence_pallas(
                        xp, wt, h0, h0)[0])
                ms = chain_time(fn, (xp, wt, h0))
                total += ms
                if li in (0, 2):     # layers 1,3-5 repeat shapes 0/2
                    print(f'  recurrence L{li} T={t_l} {label}: '
                          f'{ms:6.2f} ms')
            print(f'  recurrence 6 layers {label} total: {total:6.2f} ms')

        # hoisted input projections: (B,T,in)@(in,4H) per layer
        @jax.jit
        def projections(x):
            outs = []
            t = x
            in_size = cfg.input_size
            for li, t_l in enumerate(layer_ts):
                w = jnp.asarray(
                    rng.randn(4 * H, in_size) * 0.02, jnp.bfloat16)
                xi = jnp.asarray(
                    rng.randn(B, t_l, in_size), jnp.bfloat16)
                outs.append(jax.lax.dot_general(
                    xi, w, (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
                in_size = H
            return [o.sum() for o in outs]
        proj_ms = chain_time(projections, (xs,))
        print(f'  input projections (6 layers, fwd): {proj_ms:6.2f} ms')


if __name__ == '__main__':
    main()
