"""cli.train_lm as a subprocess on the synthetic corpus."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_train_lm(tmp_path):
    from tests.test_cli_baseline import _make_corpus
    corpus = str(tmp_path / 'libri')
    logs = str(tmp_path / 'logs')
    _make_corpus(corpus, n=8)
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, '-m', 'cli.train_lm',
         '--LibriSpeech_train_100', corpus,
         '--LibriSpeech_train_360', '/nonexistent',
         '--LibriSpeech_train_500', '/nonexistent',
         '--LibriSpeech_test', '/nonexistent',
         '--TEDLIUM_train', '/nonexistent', '--CommonVoice', '/nonexistent',
         '--YT_bloomberg2', '/nonexistent', '--YT_life', '/nonexistent',
         '--logdir_root', logs, '--name', 'lm-e2e',
         '--tokenizer', 'char', '--lr', '1e-3',
         '--lm_embed_size', '16', '--lm_hidden_size', '16',
         '--lm_layers', '1', '--lm_seq_len', '8',
         '--batch_size', '2', '--epochs', '2', '--loss_step', '1',
         '--save_step', '2', '--compilation_cache_dir', ''],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'ppl' in r.stdout
    models = os.path.join(logs, 'lm-e2e', 'models')
    assert os.path.isdir(models) and os.listdir(models)
