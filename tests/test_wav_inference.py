"""cli.wav_inference — the streaming inference benchmark harness
(reference cli/openvino_wav_inference.py:94-147) — executed as a real
subprocess over a synthetic LibriSpeech-layout corpus against BOTH the
live-jit and exported backends, asserting the report fields."""

import os
import pickle
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    '--tokenizer', 'char',
    '--enc_hidden_size', '16', '--enc_layers', '2', '--enc_proj_size', '16',
    '--dec_hidden_size', '16', '--dec_layers', '1', '--dec_proj_size', '16',
    '--joint_size', '16', '--vocab_embed_size', '8',
    '--feature_size', '8', '--n_fft', '256', '--win_length', '256',
    '--hop_length', '128', '--downsample', '3',
]


def _make_corpus(root, n=3, seconds=0.6, sr=16000):
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


def test_wav_inference_jit_and_exported_backends(tmp_path):
    corpus = str(tmp_path / 'libri')
    logs = str(tmp_path / 'logs')
    _make_corpus(corpus)
    os.makedirs(os.path.join(logs, 'tiny'), exist_ok=True)

    # char tokenizer cache the CLIs can load
    from edgedict_tpu.tokenizer import DEFAULT_TOKEN2ID
    tok2id = dict(DEFAULT_TOKEN2ID)
    for ch in 'helowrd0123456789 ':
        if ch not in tok2id:
            tok2id[ch] = len(tok2id)
    os.makedirs(os.path.join(logs, 'char'), exist_ok=True)
    with open(os.path.join(logs, 'char', 'token2id.pkl'), 'wb') as f:
        pickle.dump(tok2id, f)

    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=1',
               PYTHONPATH=REPO)
    common = ['--logdir_root', logs, '--name', 'tiny'] + TINY

    # exported backend artifacts (random weights; parity is asserted by
    # cli.export itself)
    r = subprocess.run(
        [sys.executable, '-m', 'cli.export'] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    r2 = subprocess.run(
        [sys.executable, '-m', 'cli.wav_inference',
         '--wav_dir', corpus, '--n_samples', '3',
         '--backends', 'jit,int8,exported', '--per_stage'] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    out = r2.stdout
    assert 'benchmarking 3 utterances' in out

    # report fields per backend (reference openvino_wav_inference.py
    # :108-116,139-147: WER, throughput, per-chunk latency)
    for backend in ('jit', 'int8', 'exported'):
        m = re.search(
            rf'\[{backend}\] WER (\d+\.\d+)  throughput (\d+\.\d+) '
            rf'sec/sec  mean chunk (\d+\.\d+) ms  \((\d+) utts, '
            rf'(\d+\.\d+)s audio\)', out)
        assert m, (backend, out)
        wer, rtf, ms, utts, audio_s = m.groups()
        assert 0.0 <= float(wer) <= 2.0
        assert float(rtf) > 0.0
        assert float(ms) > 0.0
        assert int(utts) == 3
        assert abs(float(audio_s) - 1.8) < 0.05      # 3 × 0.6 s

    # --per_stage: the unfused per-component latency table (the reference
    # README latency rows: featurize/encoder/joint/decoder)
    m = re.search(r'\[jit per-stage ms\] (.+)', out)
    assert m, out
    for stage in ('featurize', 'encoder', 'joint', 'decoder'):
        assert stage in m.group(1)

    # cli.youtube_live --wav: the offline jit-vs-exported A/B (reference
    # youtube_live.py:45-62) over the same export artifacts
    wav = os.path.join(corpus, '9', '9', '9-9-0000.wav')
    r3 = subprocess.run(
        [sys.executable, '-m', 'cli.youtube_live', '--wav', wav] + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert '[jit]' in r3.stdout
    assert '[exported]' in r3.stdout
