"""WER-parity runbook: reference .pt + LibriSpeech test-clean → WER.

ONE command takes the released reference checkpoint and a LibriSpeech
root and emits test-clean WER (BASELINE.md target: 16.3% with the E6D2
release):

  python -m cli.wer_parity \
      --flagfile /root/reference/flagfiles/E6D2.txt \
      --pt_path <released .pt> \
      --LibriSpeech_test <LibriSpeech>/test-clean \
      [--bpe_cache_dir <ckpt's BPE-2048 cache>] [--max_batches N]

In-process steps: tokenizer from flags (or the checkpoint's own BPE
cache via --bpe_cache_dir) → torch .pt mapped through
compat.torch_import (gate order, joint column split, lightning prefix
handling) → jitted batched greedy decode over every test-clean
utterance → one JSON line {"wer": ..., "n_utts": ...}.

Rehearsed end-to-end at FULL E6D2 scale (6×1024 enc, BPE-2048 vocab) by
tests/test_import_e2e.py::test_wer_parity_runbook_full_scale with a
synthetic torch checkpoint + synthetic mini test-clean corpus, so a
data-equipped run is a pure data drop.
"""

import json

import numpy as np
from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_string('pt_path', None, 'reference .pt checkpoint path')
flags.DEFINE_string('bpe_cache_dir', None,
                    'override BPE cache dir (released checkpoints ship '
                    'their own vocab/merges cache)')
flags.DEFINE_integer('max_batches', 0, '0 = the whole eval set')
flags.mark_flag_as_required('pt_path')


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from edgedict_tpu.compat import load_reference_checkpoint
    from edgedict_tpu.data import BucketSpec, DataLoader, Librispeech
    from edgedict_tpu.features import FeatureConfig, FeaturePipeline
    from edgedict_tpu.metrics import wer as wer_fn
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.models.decoding import truncate_and_strip
    from edgedict_tpu.parallel import make_eval_step
    from edgedict_tpu.tokenizer import HuggingFaceTokenizer
    from edgedict_tpu.trainer import build_tokenizer

    if FLAGS.bpe_cache_dir:
        tokenizer = HuggingFaceTokenizer(cache_dir=FLAGS.bpe_cache_dir,
                                         vocab_size=FLAGS.bpe_size)
    else:
        tokenizer = build_tokenizer(FLAGS)
    feature_cfg = FeatureConfig.from_flags(FLAGS)
    pipeline = FeaturePipeline(feature_cfg)
    cfg = T.TransducerConfig.from_flags(
        FLAGS, vocab_size=tokenizer.vocab_size,
        input_size=feature_cfg.input_size)
    params = load_reference_checkpoint(FLAGS.pt_path, cfg)
    params = jax.tree.map(jax.numpy.asarray, params)

    eval_ds = Librispeech(FLAGS.LibriSpeech_test, tokenizer,
                          audio_max_length=999)
    hop = FLAGS.hop_length * max(1, FLAGS.downsample)
    bucket = BucketSpec(
        t_multiple=FLAGS.audio_bucket_frames * hop,
        u_multiple=FLAGS.label_bucket,
        t_max=int(999 * 16000))
    loader = DataLoader(eval_ds, FLAGS.eval_batch_size, shuffle=False,
                        bucket=bucket, drop_last=False, prefetch=0)
    eval_step = make_eval_step(cfg, mesh=None, feature_pipeline=pipeline)

    refs, hyps = [], []
    for i, batch in enumerate(loader):
        if FLAGS.max_batches and i >= FLAGS.max_batches:
            break
        _, y_seq, out_len = eval_step(params, batch)
        seqs = truncate_and_strip(y_seq, out_len, blank=cfg.blank)
        hyps.extend(tokenizer.decode_plus(seqs))
        refs.extend(tokenizer.decode_plus(
            [y[:n] for y, n in zip(np.asarray(batch['ys']),
                                   np.asarray(batch['ylen']))]))
    pairs = [(r, h) for r, h in zip(refs, hyps) if r.strip()]
    value = wer_fn([r for r, _ in pairs], [h for _, h in pairs]) \
        if pairs else 1.0
    print(json.dumps({'wer': round(float(value), 4),
                      'n_utts': len(pairs),
                      'checkpoint': FLAGS.pt_path}))


if __name__ == '__main__':
    app.run(main)
