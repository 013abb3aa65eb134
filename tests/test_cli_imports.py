"""Every CLI entry point imports in a fresh process (catches missing
symbols like the reference's broken `nn` import in cli/train_lm.py:60 and
the undefined `ctc_beam` in models.py).  Subprocess-per-module because
absl's global flag registry forbids co-importing two CLIs that define
the same flag (each CLI is its own process entry point, as in the
reference)."""

import os
import subprocess
import sys

import pytest

CLI_MODULES = [
    'cli.baseline', 'cli.train', 'cli.distributed', 'cli.lightning',
    'cli.pretrain_wav2vec', 'cli.train_lm', 'cli.stream',
    'cli.youtube_live', 'cli.export', 'cli.demo', 'cli.wav_inference',
    'cli.import_checkpoint', 'cli.wer_parity', 'cli.serve',
]


@pytest.mark.slow
def test_cli_modules_import():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ('import importlib, sys\n'
            'for m in sys.argv[1:]:\n'
            '    importlib.import_module(m)\n'
            '    print("ok", m)\n')
    # chunked: absl flag collisions only occur between modules sharing a
    # flag name, so probe each module alone
    for mod in CLI_MODULES:
        proc = subprocess.run(
            [sys.executable, '-c', code, mod], cwd=root,
            capture_output=True, text=True, timeout=240,
            env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
        assert proc.returncode == 0, (mod, proc.stderr[-2000:])
