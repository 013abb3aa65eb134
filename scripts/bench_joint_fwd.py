"""On-chip A/B of the column-blocked fused-joint FORWARD
(EDGEDICT_JOINT_FWD_COLS, ops/joint_lse_pallas.py:_fwd_kernel_split)
against the whole-V single-matmul forward, at the B=64 train-step
headline config (VERDICT round 4 item 8: the fwd joint's ~3-5 ms of VPU
exp/log-sum work only partially overlaps the MXU — this measures whether
flash-style column blocking buys that overlap).

One subprocess per setting (the env knob is a trace-time constant).
Prints one JSON line with step_ms per setting and the verdict.

  python -m scripts.bench_joint_fwd [--batch 64] [--cols 0,512,1024]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
try:
    cache = os.path.expanduser('~/.cache/edgedict_tpu_xla')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
except Exception:
    pass
from bench import bench_train_step, _flagship
cfg, _ = _flagship()
step_ms, mfu, hfu, tp = bench_train_step(cfg, batch={batch})
print('RESULT ' + json.dumps({{'step_ms': step_ms, 'mfu': mfu,
                               'hfu': hfu, 'audio_s_per_s': tp}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--cols', default='0,512,1024')
    ap.add_argument('--timeout', type=int, default=2700)
    args = ap.parse_args()

    results = {}
    for cols in [c.strip() for c in args.cols.split(',') if c.strip()]:
        env = dict(os.environ)
        env['EDGEDICT_JOINT_FWD_COLS'] = cols
        env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
        code = CHILD.format(repo=REPO, batch=args.batch)
        proc = subprocess.run([sys.executable, '-c', code], env=env,
                              capture_output=True, text=True,
                              timeout=args.timeout)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith('RESULT ')]
        if proc.returncode != 0 or not line:
            results[f'cols_{cols}'] = {
                'error': (proc.stderr or proc.stdout)[-500:]}
            print(f'[joint_fwd] cols={cols}: FAILED', flush=True)
            continue
        r = json.loads(line[0][len('RESULT '):])
        results[f'cols_{cols}'] = {k: round(v, 4) for k, v in r.items()}
        print(f'[joint_fwd] cols={cols}: step {r["step_ms"]:.2f} ms '
              f'({r["mfu"]:.3f} MFU)', flush=True)

    ok = {k: v for k, v in results.items() if 'step_ms' in v}
    base = ok.get('cols_0', {}).get('step_ms')
    best_k = min(ok, key=lambda k: ok[k]['step_ms']) if ok else None
    out = {'metric': 'joint_fwd_col_ab', 'batch': args.batch,
           'results': results, 'best': best_k,
           'gain_ms': (round(base - ok[best_k]['step_ms'], 3)
                       if base and best_k else None)}
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
