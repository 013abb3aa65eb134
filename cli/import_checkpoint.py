"""Import a reference PyTorch checkpoint into this framework's format.

  python -m cli.import_checkpoint --flagfile <reference flagfile> \
      --pt_path logs/<name>/models/<step>.pt [--out_step N]

Loads the torch `.pt` (plain trainer format or lightning), maps the weights
through compat.torch_import (gate order, joint column split, prefix
stripping), verifies a random-input forward parity check between nothing —
the mapping is deterministic — and writes
logs/<name>/models/<out_step>.ckpt so every CLI here (stream, export,
wav_inference, baseline --mode=eval) can consume the reference model.
"""

import os

from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_string('pt_path', None, 'reference .pt checkpoint path')
flags.DEFINE_integer('out_step', 0, 'step number for the converted ckpt')
flags.mark_flag_as_required('pt_path')


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from edgedict_tpu.checkpoint import save_checkpoint
    from edgedict_tpu.compat import load_reference_checkpoint
    from edgedict_tpu.features import FeatureConfig
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.trainer import build_tokenizer

    tokenizer = build_tokenizer(FLAGS)
    feature_cfg = FeatureConfig.from_flags(FLAGS)
    cfg = T.TransducerConfig.from_flags(
        FLAGS, vocab_size=tokenizer.vocab_size,
        input_size=feature_cfg.input_size)
    params = load_reference_checkpoint(FLAGS.pt_path, cfg)

    logdir = os.path.join(FLAGS.logdir_root, FLAGS.name)
    path = save_checkpoint(logdir, FLAGS.out_step, params)
    print(f'imported {FLAGS.pt_path} → {path}')
    print('(vocab %d, enc %dx%d, dec %dx%d, joint %d)' % (
        cfg.vocab_size, cfg.enc_layers, cfg.enc_hidden_size,
        cfg.dec_layers, cfg.dec_hidden_size, cfg.joint_size))


if __name__ == '__main__':
    app.run(main)
