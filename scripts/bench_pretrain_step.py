"""On-chip wav2vec 2.0 pretraining step benchmark (VERDICT round 4 item 2a).

Times the REAL production pretrain step — Wav2VecPretrainer.run_step:
conv FrontEnd → span-mask scatter → LSTM encoder → Gumbel VQ → in-jit
negatives → InfoNCE + penalties → AdamW, one sharded jit — at a pinned
config (B=32 × 3 s raw audio crops, the reference's
pretrain_audio_samples=48000 default; encoder 6×1024 so the weights splice
into the E6D2 fine-tune, reference cli/train.py:38-53), slope-timed on
device exactly like bench.py's train phases.

Prints one JSON line: step_ms, audio_s_per_s, analytic MFU/HFU over the
frontend-conv + LSTM-encoder + head matmul FLOPs (the VQ/InfoNCE gather
and softmax work is VPU-bound and uncounted, so the MFU printed is a
lower bound).

  python -m scripts.bench_pretrain_step [--batch 32] [--steps 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000
PEAK_FLOPS = {
    'TPU v4': 275e12, 'TPU v5 lite': 197e12, 'TPU v5': 459e12,
    'TPU v5p': 459e12, 'TPU v6 lite': 918e12,
}


class _RawToy:
    """Unlabeled raw-audio dataset (pretraining consumes no transcripts)."""

    def __init__(self, n, samples, seed=0):
        rng = np.random.RandomState(seed)
        self.clips = [
            (np.sin(2 * np.pi * (200 + 40 * (i % 20))
                    * np.arange(samples + 1000) / SR).astype(np.float32)
             + 0.05 * rng.randn(samples + 1000).astype(np.float32),
             np.zeros(0, np.int32))
            for i in range(n)]

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, i):
        return self.clips[i]


def pretrain_fwd_flops(cfg, frontend_spec, b, n_samples):
    """Analytic forward matmul FLOPs: frontend convs (2·B·T_out·C_out·C_in·K
    per layer), LSTM encoder (2·B·T·4H·(in+H) per layer + projection), and
    the final_dim heads.  Returns (fwd_flops, t_frames)."""
    from edgedict_tpu.models import wav2vec as W
    fl = 0
    t, in_ch = n_samples, 1
    for (k, s, c) in frontend_spec:
        pad = k - 1
        t_out = (t + 2 * pad - k) // s + 1 - pad
        fl += 2 * b * t_out * c * in_ch * k
        t, in_ch = t_out, c
    t_frames = W.frontend_output_length(frontend_spec, n_samples)
    h, p = cfg.enc_hidden_size, cfg.enc_proj_size
    d_in = cfg.input_size
    for _ in range(cfg.enc_layers):
        fl += 2 * b * t_frames * 4 * h * (d_in + h)
        d_in = h
    fl += 2 * b * t_frames * h * p
    # contrastive heads: project_q (vq_dim→final) + final_proj (proj→final)
    final = cfg.final_dim or p
    fl += 2 * b * t_frames * p * final
    fl += 2 * b * t_frames * final * final
    return fl, t_frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--steps', type=int, default=10,
                    help='slope-timing chain length (hi leg)')
    ap.add_argument('--samples', type=int, default=48000,
                    help='raw-audio crop (reference pretrain default: 3 s)')
    ap.add_argument('--logdir', default='/tmp/edgedict_pretrain_bench')
    ap.add_argument('--tiny', action='store_true',
                    help='tiny encoder + 0.5 s crops: CPU smoke of the '
                         'harness itself, not a perf measurement')
    ap.add_argument('--trace', action='store_true',
                    help='also capture an op-level device breakdown '
                         '(jax.profiler xplane, per category)')
    args = ap.parse_args()
    if args.tiny:
        args.batch, args.samples = 4, 8000

    import jax
    try:
        cache = os.path.expanduser('~/.cache/edgedict_tpu_xla')
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass

    from edgedict_tpu.pretrain_config import FLAGS
    from edgedict_tpu.config import ensure_parsed
    ensure_parsed(['bench_pretrain'])
    FLAGS.name = 'pretrain_bench'
    FLAGS.logdir_root = args.logdir
    # E6D2-spliceable encoder (enc weights initialize cli/train.py's
    # raw-waveform transducer, reference cli/train.py:38-53)
    FLAGS.enc_hidden_size = 128 if args.tiny else 1024
    FLAGS.enc_layers = 2 if args.tiny else 6
    FLAGS.enc_proj_size = 128 if args.tiny else 640
    FLAGS.batch_size = args.batch
    FLAGS.sub_batch_size = args.batch
    FLAGS.pretrain_audio_samples = args.samples
    FLAGS.dp_size = 1
    FLAGS.tp_size = 1

    from edgedict_tpu.pretrainer import Wav2VecPretrainer
    ds = _RawToy(args.batch * 4, args.samples)
    pre = Wav2VecPretrainer(FLAGS, ds)

    samples = [ds[i] for i in range(args.batch)]
    batch = pre.make_batch(samples)

    # pre-place ONE batch on device and re-feed the DEVICE arrays —
    # looping run_step(host_batch) would re-upload the ~6 MB of audio
    # every iteration and measure the tunnel's H2D, not the step (first
    # attempt read 462 ms for a step whose device ops trace at ~35 ms)
    import jax.numpy as jnp
    from edgedict_tpu.parallel import shard_batch
    sharded = shard_batch(pre.mesh, batch, pre.accum_steps)
    lr = jnp.asarray(FLAGS.lr, jnp.float32)
    aux = {'temp': jnp.asarray(FLAGS.init_temp, jnp.float32)}
    rng = jax.random.PRNGKey(5)

    state, m = pre.train_step(pre.state, sharded, rng, lr, aux)
    float(m['loss'])                              # compile + warmup

    def run_n(n):
        nonlocal state
        t0 = time.time()
        for _ in range(n):
            state, m = pre.train_step(state, sharded, rng, lr, aux)
        float(m['loss'])                          # one sync fetch
        return time.time() - t0

    lo_n, hi_n = 3, max(args.steps, 6)
    lo = min(run_n(lo_n) for _ in range(3))
    hi = min(run_n(hi_n) for _ in range(3))
    sec_per_step = (hi - lo) / (hi_n - lo_n)

    trace_cats = None
    if args.trace:
        # op-level device breakdown (same xplane parsing as
        # trace_train_step): which pretrain phase owns the time — the
        # input to the "is a Pallas kernel warranted?" question
        import tempfile
        import jax as _jax
        from scripts.trace_train_step import categorize, device_op_events
        tmp = tempfile.mkdtemp(prefix='pretrain_trace_')
        n_tr = 4
        try:
            _jax.profiler.start_trace(tmp)
            run_n(n_tr)
            _jax.profiler.stop_trace()
            cats = {}
            for name, us in device_op_events(tmp):
                cats[categorize(name)] = cats.get(categorize(name), 0.0) \
                    + us / 1e3 / n_tr
            trace_cats = {k: round(v, 3) for k, v in
                          sorted(cats.items(), key=lambda kv: -kv[1])}
        except Exception as e:                        # noqa: BLE001
            trace_cats = {'error': repr(e)[:120]}

    fwd, t_frames = pretrain_fwd_flops(
        pre.cfg, pre.cfg.frontend_params, args.batch, args.samples)
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 275e12)
    mfu = 3 * fwd / sec_per_step / peak
    audio_s = args.batch * args.samples / SR
    out = {
        'metric': 'pretrain_step_ms',
        'value': round(sec_per_step * 1e3, 3),
        'unit': 'ms',
        'batch': args.batch,
        'crop_samples': args.samples,
        't_frames': t_frames,
        'audio_s_per_s': round(audio_s / sec_per_step, 1),
        'mfu_lower_bound': round(mfu, 4),
        'device_kind': kind,
        'contrastive_loss': round(float(m['contrastive_loss']), 4),
    }
    if trace_cats is not None:
        out['device_ms_by_category'] = trace_cats
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
