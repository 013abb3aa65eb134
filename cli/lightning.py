"""Compatibility alias: the reference's `python -m cli.lightning`
(pytorch-lightning DDP trainer, cli/lightning.py:28-362) maps to
`cli.distributed` here — lightning's entire role (multi-process DDP, grad
accumulation, fp16, best-WER checkpointing) is covered by the mesh-sharded
train step + Trainer.  See cli/distributed.py.
"""

from cli.distributed import main  # noqa: F401

if __name__ == '__main__':
    from absl import app
    app.run(main)
