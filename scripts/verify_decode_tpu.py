"""On-TPU verification + timing for the fused greedy decode kernel.

Runs on the real chip (not the CPU test mesh):
  1. harness canary — bare 4096^3 bf16 matmul must slope-time at ~0.73 ms
     on a v5e or the session's readings can't be trusted
     (VALIDATION.md §3 timing methodology);
  2. fused-vs-scan parity at E6D2 scale, streaming (frame loop) and
     offline (T-blocked + frame log-probs), f32 and bf16;
  3. slope-timed offline decode across EDGEDICT_DECODE_BLOCK settings.

Usage:  python -m scripts.verify_decode_tpu [--blocks 16,32,64]
"""

import argparse
import os
import time

import numpy as np


def slope(fn, lo=2, hi=8, reps=3):
    """Best-of-reps chained-dispatch slope time (seconds per call)."""
    fn(hi)                                       # warmup/compile
    t_lo = min(fn(lo) for _ in range(reps))
    t_hi = min(fn(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo)


def canary():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, n: jax.lax.fori_loop(
        0, n, lambda _, c: (c @ x), a))

    def run(n):
        t0 = time.time()
        np.asarray(mm(x, n)[0, 0])
        return time.time() - t0

    ms = slope(run, 4, 24) * 1e3
    print(f'canary: 4096^3 bf16 matmul {ms:.3f} ms/op '
          f'(expect ~0.73 on v5e; >2x off => untrustworthy session)')
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--blocks', default='16,32,64')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--utt_seconds', type=float, default=15.0)
    args = ap.parse_args()

    import jax
    try:
        cache = os.path.expanduser('~/.cache/edgedict_tpu_xla')
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.models.decoding import greedy_decode_from_encoder
    from edgedict_tpu.ops import decode_pallas
    from edgedict_tpu.stream import (
        make_stream_state, prepare_inference_params, _make_chunk_step_fn)

    print('backend:', jax.default_backend(), jax.devices()[0].device_kind)
    canary()

    cfg = T.TransducerConfig(
        vocab_size=2048, vocab_embed_size=64, input_size=240,
        enc_hidden_size=1024, enc_layers=6, enc_proj_size=640,
        dec_hidden_size=256, dec_layers=2, dec_proj_size=256,
        joint_size=640, enc_time_reductions=(1,))
    print('probe (compile-only, both lowerings, f32+bf16):',
          decode_pallas._tpu_kernel_works())

    # ---- streaming frame loop parity on chip --------------------------
    # legs: (serving dtype, fully_cast, bound).  Production legs (f32 and
    # the bf16 serving policy — bf16 encoder + fp32 token loop) must be
    # token-EXACT: the frame loop executes pure-fp32 arithmetic, where
    # Mosaic-vs-XLA accumulation-order drift never flips an argmax.  The
    # fully-cast bf16 leg exercises the kernel's bf16 arithmetic (not a
    # production config): Mosaic and XLA tile the same fp32-accumulated
    # matmuls in different orders and a near-tie at a bf16 rounding
    # boundary flips, after which the decoder state cascades — bound the
    # RATE at a small multiple of the measured ~2% envelope so a real
    # kernel regression (e.g. 20% of tokens wrong) still fails.
    from edgedict_tpu.stream import cast_floating
    legs = [(jnp.float32, False, 0.0), (jnp.bfloat16, False, 0.0),
            (jnp.bfloat16, True, 0.05)]
    for dtype, fully_cast, bound in legs:
        params = T.transducer_init(jax.random.PRNGKey(0), cfg)
        if fully_cast:
            params = prepare_inference_params(cast_floating(params, dtype))
        else:
            params = prepare_inference_params(params, dtype)
        state = make_stream_state(params, cfg, batch=8)
        enc = jax.random.normal(jax.random.PRNGKey(1),
                                (8, 12, cfg.enc_proj_size)).astype(dtype)
        os.environ['EDGEDICT_PALLAS_DECODE'] = '0'
        ref = _make_chunk_step_fn(params, cfg, None, 3).frame_loop(
            params, state, enc)
        # 'force': auto mode declines on unmeshed multi-device hosts — the
        # sweep must exercise the KERNEL, not verify scan==scan (on a TPU
        # backend force still compiles for real; interpret is off-TPU only)
        os.environ['EDGEDICT_PALLAS_DECODE'] = 'force'
        out = _make_chunk_step_fn(params, cfg, None, 3).frame_loop(
            params, state, enc)
        tok_ref, tok_out = np.asarray(ref[0]), np.asarray(out[0])
        mismatch = float((tok_ref != tok_out).mean())
        hdec_diff = float(np.max(np.abs(
            np.asarray(ref[1], np.float32) - np.asarray(out[1],
                                                        np.float32))))
        name = np.dtype(dtype).name + (' (fully cast)' if fully_cast
                                       else ' (serving policy)')
        print(f'streaming parity {name}: token_mismatch='
              f'{mismatch:.4f} hdec_maxdiff={hdec_diff:.2e}')
        if bound == 0.0:
            assert mismatch == 0.0, (name, mismatch)
        else:
            assert mismatch < bound, (name, mismatch)

    # ---- offline decode parity + block sweep --------------------------
    # Three legs mirror the streaming sweep: fp32 (token-exact, one block
    # setting), the production bf16 serving policy (bf16 encoder + fp32
    # token loop — token-exact, timed across EDGEDICT_DECODE_BLOCK), and
    # fully-cast bf16 (kernel bf16-arithmetic coverage, rate-bounded).
    n_frames = int(args.utt_seconds * 16000 - 320) // 200 + 1
    t_ds = (n_frames // 3) - (n_frames // 3) % 4
    audio_s = args.batch * args.utt_seconds
    base = T.transducer_init(jax.random.PRNGKey(2), cfg)

    def run_leg(name, params, enc_dtype, blocks, bound):
        xs = jax.random.normal(
            jax.random.PRNGKey(3),
            (args.batch, t_ds, cfg.input_size)).astype(enc_dtype)
        h_enc, _ = jax.jit(lambda p, x: T.encoder_apply(
            p['encoder'], cfg, x))(params, xs)
        jax.block_until_ready(h_enc)

        def timed(fn):
            def run(n):
                t0 = time.time()
                for _ in range(n):
                    y, _ = fn(params, h_enc)
                np.asarray(y)
                return time.time() - t0
            return slope(run) * 1e3

        os.environ['EDGEDICT_PALLAS_DECODE'] = '0'
        fn_scan = jax.jit(
            lambda p, h: greedy_decode_from_encoder(p, cfg, h))
        y_ref, nlp_ref = fn_scan(params, h_enc)
        y_ref = np.asarray(y_ref)
        scan_ms = timed(fn_scan)
        print(f'offline scan [{name}]:  {scan_ms:8.3f} ms/batch '
              f'({audio_s / scan_ms * 1e3:8.1f} audio-s/s)')

        os.environ['EDGEDICT_PALLAS_DECODE'] = 'force'
        for block in blocks:
            os.environ['EDGEDICT_DECODE_BLOCK'] = block
            fn = jax.jit(
                lambda p, h: greedy_decode_from_encoder(p, cfg, h))
            y, nlp = fn(params, h_enc)
            mism = float((np.asarray(y) != y_ref).mean())
            nlp_diff = float(np.max(np.abs(
                np.asarray(nlp, np.float32)
                - np.asarray(nlp_ref, np.float32))))
            ms = timed(fn)
            print(f'offline fused [{name}] (block={block:>3}): '
                  f'{ms:8.3f} ms/batch ({audio_s / ms * 1e3:8.1f} '
                  f'audio-s/s)  token_mismatch={mism:.4f} '
                  f'nlp_maxdiff={nlp_diff:.2e}')
            if bound == 0.0:
                assert mism == 0.0, (name, block, mism)
            else:
                assert mism < bound, (name, block, mism)

    blocks = args.blocks.split(',')
    # fp32: token-EXACT on chip, one block setting suffices
    run_leg('f32', prepare_inference_params(base), jnp.float32,
            blocks[:1], 0.0)
    # production bf16 serving policy: fp32 token loop → token-exact;
    # this is the serving config, so it carries the full timing sweep
    run_leg('bf16 serving', prepare_inference_params(base, jnp.bfloat16),
            jnp.bfloat16, blocks, 0.0)
    # fully-cast bf16: kernel bf16 arithmetic, near-tie flips rate-bounded
    from edgedict_tpu.stream import cast_floating
    run_leg('bf16 fully-cast',
            prepare_inference_params(cast_floating(base, jnp.bfloat16)),
            jnp.bfloat16, blocks[:1], 0.05)


if __name__ == '__main__':
    main()
