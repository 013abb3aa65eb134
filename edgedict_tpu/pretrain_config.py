"""wav2vec pretraining flag registry (reference rnnt/pretrain_args.py:5-38).

Shares the main registry's dataset-path flags (edgedict_tpu.config); the
pretraining-specific knobs below carry the reference names/defaults so its
invocations port over unchanged.
"""

from absl import flags

from edgedict_tpu.config import FLAGS, define_flags, _define_once

define_flags()   # dataset roots, batch sizes, shared surface


def define_pretrain_flags():
    d = _define_once
    d(flags.DEFINE_float, 'prob_perplex', 0.1, help='prob_perplexity weight')
    d(flags.DEFINE_float, 'code_perplex', 1.0, help='code_perplexity weight')
    d(flags.DEFINE_float, 'features_pen', 10.0, help='feature penalty weight')
    d(flags.DEFINE_float, 'init_temp', 1.0, help='initial Gumbel temperature')
    d(flags.DEFINE_float, 'min_temp', 0.1, help='minimum Gumbel temperature')
    d(flags.DEFINE_float, 'temp_decay', 0.999995, help='temperature decay')
    d(flags.DEFINE_integer, 'eval_iteration', 1000, help='eval frequency')
    d(flags.DEFINE_float, 'beta1', 0.9, help='adam beta1')
    d(flags.DEFINE_float, 'beta2', 0.998, help='adam beta2')
    d(flags.DEFINE_float, 'weight_decay', 0.01, help='adamw weight decay')
    d(flags.DEFINE_integer, 'num_negatives', 100,
      help='contrastive negatives per masked step')
    d(flags.DEFINE_float, 'mask_prob', 0.15, help='span mask probability')
    d(flags.DEFINE_integer, 'mask_length', 10, help='span mask length')
    d(flags.DEFINE_integer, 'latent_vars', 320,
      help='codebook entries per group')
    d(flags.DEFINE_integer, 'latent_groups', 2, help='codebook groups')
    d(flags.DEFINE_integer, 'final_dim', 256, help='contrastive dim')
    d(flags.DEFINE_integer, 'pretrain_audio_samples', 48000,
      help='raw-audio crop length for pretraining batches (samples)')


define_pretrain_flags()
