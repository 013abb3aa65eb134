"""AOT export CLI (the reference cli/export_onnx.py + export_openvino.sh
pipeline collapsed into one step):

  python -m cli.export --flagfile logs/<name>/flagfile.txt \
      [--export_dir logs/<name>/export] [--resume_step N]

Rebuilds the transducer from the flag snapshot + checkpoint, serializes the
encoder/decoder/joint triplet as StableHLO artifacts at the pinned
streaming shapes, and asserts numerical parity (rtol 1e-3 / atol 1e-5,
reference cli/export_onnx.py:63-68).
"""

import os

from absl import app, flags

from edgedict_tpu.config import FLAGS

import cli.stream  # noqa: F401 — registers the shared serving flags
                   # (--quantize) so exports match serving precision

flags.DEFINE_string('export_dir', None,
                    'output dir (default logs/<name>/export)')
flags.DEFINE_integer('export_step_n_frame', 2,
                     'encoder frames per streaming chunk')


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from edgedict_tpu.checkpoint import (
        checkpoint_path, latest_step, load_checkpoint)
    from edgedict_tpu.export import export_transducer
    from edgedict_tpu.features import FeatureConfig
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.trainer import build_tokenizer

    tokenizer = build_tokenizer(FLAGS)
    feature_cfg = FeatureConfig.from_flags(FLAGS, pad_to_divisible=False)
    cfg = T.TransducerConfig.from_flags(
        FLAGS, vocab_size=tokenizer.vocab_size,
        input_size=feature_cfg.input_size)
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)

    logdir = os.path.join(FLAGS.logdir_root, FLAGS.name)
    step = FLAGS.resume_step or latest_step(logdir)
    if step is not None:
        payload = load_checkpoint(checkpoint_path(logdir, step), params)
        params = payload['model']
        print(f'loaded step {step}')
    else:
        print('WARNING: exporting randomly initialized weights')

    out = FLAGS.export_dir or os.path.join(logdir, 'export')
    quantize = getattr(FLAGS, 'quantize', '') or None
    export_transducer(params, cfg, out,
                      step_frames=FLAGS.export_step_n_frame,
                      quantize=quantize)
    enc_bytes = os.path.getsize(os.path.join(out, 'encoder.stablehlo'))
    tag = f', int8 encoder {enc_bytes / 1e6:.1f} MB' if quantize else ''
    print(f'exported encoder/decoder/joint → {out} (parity OK{tag})')


if __name__ == '__main__':
    app.run(main)
