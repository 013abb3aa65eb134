"""cli.export and cli.stream as real subprocesses on a trained-ish logdir."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    '--tokenizer', 'char',
    '--enc_hidden_size', '16', '--enc_layers', '2', '--enc_proj_size', '16',
    '--dec_hidden_size', '16', '--dec_layers', '1', '--dec_proj_size', '16',
    '--joint_size', '16', '--vocab_embed_size', '8',
    '--feature_size', '8', '--n_fft', '256', '--win_length', '256',
    '--hop_length', '128', '--downsample', '3',
]


@pytest.mark.slow
def test_cli_export_then_stream(tmp_path):
    logs = str(tmp_path / 'logs')
    os.makedirs(os.path.join(logs, 'tiny'), exist_ok=True)
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               PYTHONPATH=REPO)
    common = ['--logdir_root', logs, '--name', 'tiny'] + TINY

    # build a char tokenizer cache the CLIs can load
    import pickle
    from edgedict_tpu.tokenizer import DEFAULT_TOKEN2ID
    tok2id = dict(DEFAULT_TOKEN2ID)
    for ch in 'abcdefgh ':
        tok2id[ch] = len(tok2id)
    os.makedirs(os.path.join(logs, 'char'), exist_ok=True)
    with open(os.path.join(logs, 'char', 'token2id.pkl'), 'wb') as f:
        pickle.dump(tok2id, f)

    r = subprocess.run(
        [sys.executable, '-m', 'cli.export'] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    export_dir = os.path.join(logs, 'tiny', 'export')
    for name in ('encoder', 'decoder', 'joint'):
        assert os.path.exists(os.path.join(export_dir,
                                           f'{name}.stablehlo'))
    assert 'parity OK' in r.stdout

    # stream a wav through cli.stream (random weights; exercises the path)
    from edgedict_tpu.data.audio_io import save_wav
    wav = str(tmp_path / 'x.wav')
    t = np.linspace(0, 1.5, 24000, endpoint=False)
    save_wav(wav, 0.3 * np.sin(2 * np.pi * 500 * t), 16000)
    r2 = subprocess.run(
        [sys.executable, '-m', 'cli.stream', '--path', wav] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert 'throughput' in r2.stdout

    # and through cli.demo over the exported artifacts
    r3 = subprocess.run(
        [sys.executable, '-m', 'cli.demo', '--path', wav] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r3.returncode == 0, r3.stderr[-3000:]

    # int8 weight-only serving through the same CLI (ops/quant.py route)
    r4 = subprocess.run(
        [sys.executable, '-m', 'cli.stream', '--path', wav,
         '--quantize', 'int8'] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r4.returncode == 0, r4.stderr[-3000:]
    assert 'throughput' in r4.stdout
