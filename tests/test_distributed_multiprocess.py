"""True multi-process run of cli.distributed: 2 host processes × 2 virtual
CPU devices each, coordinated over grpc — validates
jax.distributed.initialize + per-host dataset sharding + the global-mesh
train step end to end."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cache_dir(tmp_path):
    """Persistent XLA compile cache if writable, else per-test tmp."""
    d = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                       os.path.expanduser('~/.cache/edgedict_tpu_xla_cpu'))
    try:
        os.makedirs(d, exist_ok=True)
        probe = os.path.join(d, '.probe')
        with open(probe, 'w'):
            pass
        os.remove(probe)
        return d
    except OSError:
        return str(tmp_path / 'xla_cache')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.graded
def test_two_process_distributed_training(tmp_path):
    from tests.test_cli_baseline import _make_corpus
    corpus = str(tmp_path / 'libri')
    logs = str(tmp_path / 'logs')
    _make_corpus(corpus, n=8)
    port = _free_port()

    common = [
        '--coordinator_address', f'127.0.0.1:{port}',
        '--num_processes', '2',
        '--LibriSpeech_train_100', corpus,
        '--LibriSpeech_train_360', '/nonexistent',
        '--LibriSpeech_train_500', '/nonexistent',
        '--LibriSpeech_test', '/nonexistent',
        '--TEDLIUM_train', '/nonexistent', '--CommonVoice', '/nonexistent',
        '--YT_bloomberg2', '/nonexistent', '--YT_life', '/nonexistent',
        '--logdir_root', logs, '--name', 'dist-e2e',
        '--tokenizer', 'char',
        '--batch_size', '4', '--sub_batch_size', '4',
        '--eval_batch_size', '2',
        '--enc_hidden_size', '16', '--enc_layers', '2',
        '--enc_proj_size', '16', '--dec_hidden_size', '16',
        '--dec_layers', '1', '--dec_proj_size', '16',
        '--joint_size', '16', '--vocab_embed_size', '8',
        '--feature_size', '8', '--n_fft', '256', '--win_length', '256',
        '--hop_length', '128', '--downsample', '3',
        '--audio_bucket_frames', '8', '--warmup_step', '2',
        '--loss_step', '1', '--save_step', '1000', '--eval_step', '1000',
        '--epochs', '1', '--gradclip', '5',
        '--dp_size', '-1', '--tp_size', '1',
        # persistent XLA cache: both child processes compile the same
        # 4-device train step — warm suite runs skip it entirely (the
        # jax cache is concurrency-safe: atomic temp-file renames);
        # falls back to tmp_path when the home cache isn't writable
        '--compilation_cache_dir', _cache_dir(tmp_path),
    ]
    # pre-build the char tokenizer cache so both processes agree
    import pickle
    from edgedict_tpu.tokenizer import DEFAULT_TOKEN2ID
    tok2id = dict(DEFAULT_TOKEN2ID)
    for ch in 'abcdefghijklmnopqrstuvwxyz 0123456789':
        tok2id[ch] = len(tok2id)
    os.makedirs(os.path.join(logs, 'char'), exist_ok=True)
    with open(os.path.join(logs, 'char', 'token2id.pkl'), 'wb') as f:
        pickle.dump(tok2id, f)

    procs = []
    for pid in (0, 1):
        env = dict(os.environ, JAX_PLATFORMS='cpu',
                   XLA_FLAGS='--xla_force_host_platform_device_count=2'
                             ' --xla_backend_optimization_level=0'
                             ' --xla_llvm_disable_expensive_passes=true',
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS='0.1',
                   PYTHONPATH=REPO)
        procs.append(subprocess.Popen(
            [sys.executable, '-m', 'cli.distributed',
             '--process_id', str(pid)] + common,
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid}:\n{out[-3000:]}'
    assert 'process 0/2' in outs[0] and '4 global devices' in outs[0]
    assert 'loss' in outs[0]
