"""Console-script entry points (pyproject.toml [project.scripts]).

Each CLI module follows the reference's absl pattern — a module-level
`main(argv)` run via `app.run(main)` under `if __name__ == '__main__'`
(e.g. /root/reference/cli/train.py:16) — so an installed `edgedict-*`
script just imports the module lazily and hands its main to absl.  Lazy
import keeps `pip install` fast and avoids pulling jax at script-table
resolution time."""

import importlib

from absl import app


def _make(module_name):
    def run():
        module = importlib.import_module(module_name)
        app.run(module.main)
    run.__name__ = module_name.rsplit('.', 1)[-1]
    run.__doc__ = f'Run {module_name} (python -m {module_name}).'
    return run


train = _make('cli.train')
baseline = _make('cli.baseline')
distributed = _make('cli.distributed')
pretrain_wav2vec = _make('cli.pretrain_wav2vec')
train_lm = _make('cli.train_lm')
stream = _make('cli.stream')
serve = _make('cli.serve')
demo = _make('cli.demo')
youtube_live = _make('cli.youtube_live')
export = _make('cli.export')
wav_inference = _make('cli.wav_inference')
import_checkpoint = _make('cli.import_checkpoint')
wer_parity = _make('cli.wer_parity')
