"""cli.baseline driven as a real subprocess on a synthetic corpus:
flag parsing, training loop, checkpointing, eval mode."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_corpus(root, n=8, seconds=0.6, sr=16000):
    from edgedict_tpu.data.audio_io import save_wav
    rng = np.random.RandomState(0)
    d = os.path.join(root, '9', '9')
    os.makedirs(d, exist_ok=True)
    lines = []
    for i in range(n):
        name = f'9-9-{i:04d}'
        t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
        save_wav(os.path.join(d, name + '.wav'),
                 0.3 * np.sin(2 * np.pi * (300 + 40 * i) * t)
                 + 0.05 * rng.randn(len(t)), sr)
        lines.append(f'{name} HELLO WORLD {i}')
    with open(os.path.join(d, '9-9.trans.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')


@pytest.mark.slow
def test_cli_baseline_train_and_eval(tmp_path):
    corpus = str(tmp_path / 'libri')
    logs = str(tmp_path / 'logs')
    _make_corpus(corpus)
    common = [
        '--LibriSpeech_train_100', corpus,
        '--LibriSpeech_train_360', '/nonexistent',
        '--LibriSpeech_train_500', '/nonexistent',
        '--LibriSpeech_test', corpus,
        '--TEDLIUM_train', '/nonexistent',
        '--CommonVoice', '/nonexistent',
        '--YT_bloomberg2', '/nonexistent', '--YT_life', '/nonexistent',
        '--logdir_root', logs, '--name', 'cli-e2e',
        '--tokenizer', 'char',
        '--batch_size', '4', '--sub_batch_size', '2',
        '--eval_batch_size', '2',
        '--enc_hidden_size', '16', '--enc_layers', '2',
        '--enc_proj_size', '16', '--dec_hidden_size', '16',
        '--dec_layers', '1', '--dec_proj_size', '16',
        '--joint_size', '16', '--vocab_embed_size', '8',
        '--feature_size', '8', '--n_fft', '256', '--win_length', '256',
        '--hop_length', '128', '--downsample', '3',
        '--audio_bucket_frames', '8', '--warmup_step', '2',
        '--loss_step', '1', '--save_step', '2', '--eval_step', '1000',
        '--epochs', '2', '--gradclip', '5',
        '--dp_size', '2', '--tp_size', '1',
    ]
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               PYTHONPATH=REPO)

    r = subprocess.run(
        [sys.executable, '-m', 'cli.baseline', '--mode', 'train'] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'loss' in r.stdout
    models = os.path.join(logs, 'cli-e2e', 'models')
    assert os.path.isdir(models) and os.listdir(models), r.stdout[-2000:]
    assert os.path.exists(os.path.join(logs, 'cli-e2e', 'flagfile.txt'))

    r2 = subprocess.run(
        [sys.executable, '-m', 'cli.baseline', '--mode', 'eval'] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert 'WER' in r2.stdout


@pytest.mark.slow
def test_cli_baseline_train_pipeline_parallel(tmp_path):
    """--pp_size 2 routes the trainer through the pipelined train step
    (dp=2 × pp=2 mesh; enc_layers=4 → preamble 2 + 2 pipelined stages)."""
    corpus = str(tmp_path / 'libri')
    logs = str(tmp_path / 'logs')
    _make_corpus(corpus)
    args = [
        '--LibriSpeech_train_100', corpus,
        '--LibriSpeech_train_360', '/nonexistent',
        '--LibriSpeech_train_500', '/nonexistent',
        '--LibriSpeech_test', corpus,
        '--TEDLIUM_train', '/nonexistent',
        '--CommonVoice', '/nonexistent',
        '--YT_bloomberg2', '/nonexistent', '--YT_life', '/nonexistent',
        '--logdir_root', logs, '--name', 'cli-pp',
        '--tokenizer', 'char',
        '--batch_size', '4', '--sub_batch_size', '2',
        '--eval_batch_size', '2',
        '--enc_hidden_size', '16', '--enc_layers', '4',
        '--enc_proj_size', '16', '--dec_hidden_size', '16',
        '--dec_layers', '1', '--dec_proj_size', '16',
        '--joint_size', '16', '--vocab_embed_size', '8',
        '--feature_size', '8', '--n_fft', '256', '--win_length', '256',
        '--hop_length', '128', '--downsample', '3',
        '--audio_bucket_frames', '8', '--warmup_step', '2',
        '--loss_step', '1', '--save_step', '1000', '--eval_step', '1000',
        '--epochs', '2', '--gradclip', '5',
        '--dp_size', '2', '--tp_size', '1', '--pp_size', '2',
    ]
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, '-m', 'cli.baseline', '--mode', 'train'] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'loss' in r.stdout
