"""Flag registry — the flagfile-driven public configuration API.

Mirrors the reference registry (/root/reference/rnnt/args.py:4-92) name-for-name
and default-for-default so that the reference's flagfile presets
(flagfiles/E4D1.txt, E6D2.txt, E6D2_LARGE_Batch.txt) drive this stack
unchanged.  Each run snapshots its flags to logs/<name>/flagfile.txt
(reference: cli/baseline.py:175) and downstream tools (stream, export) consume
that snapshot, keeping model hyperparameters glued to checkpoints.

TPU additions are registered under their own section at the bottom and are all
optional, so reference flagfiles remain valid inputs.
"""

import os

from absl import flags

FLAGS = flags.FLAGS


def _define_once(define_fn, name, *args, **kwargs):
    if name not in FLAGS:
        define_fn(name, *args, **kwargs)


def define_flags():
    """Register the full flag surface.  Idempotent."""
    d = _define_once
    d(flags.DEFINE_string, 'name', 'rnn-t-v5', help='session name')
    d(flags.DEFINE_enum, 'mode', 'train',
      ['train', 'resume', 'eval', 'device_rate'], help='mode')
    d(flags.DEFINE_integer, 'resume_step', None, help='model step')
    # dataset roots (reference rnnt/args.py:8-34)
    d(flags.DEFINE_string, 'LibriSpeech_train_100',
      '../librispeech/LibriSpeech/train-clean-100', help='LibriSpeech train')
    d(flags.DEFINE_string, 'LibriSpeech_train_360',
      '../librispeech/LibriSpeech/train-clean-360', help='LibriSpeech train')
    d(flags.DEFINE_string, 'LibriSpeech_train_500',
      '../librispeech/LibriSpeech/train-other-500', help='LibriSpeech train')
    d(flags.DEFINE_string, 'LibriSpeech_test',
      '../librispeech/LibriSpeech/test-clean', help='LibriSpeech test')
    d(flags.DEFINE_string, 'LibriSpeech_dev',
      '../librispeech/LibriSpeech/dev-clean', help='LibriSpeech dev')
    d(flags.DEFINE_string, 'TEDLIUM_train',
      '../speech_data/TEDLIUM/TEDLIUM_release1/train', help='TEDLIUM 1 train')
    d(flags.DEFINE_string, 'TEDLIUM_test',
      '../speech_data/TEDLIUM/TEDLIUM_release1/test', help='TEDLIUM 1 test')
    d(flags.DEFINE_string, 'CommonVoice', '../speech_data/common_voice',
      help='common voice')
    d(flags.DEFINE_string, 'YT_bloomberg2', '../speech_data/common_voice',
      help='youtube caption corpus')
    d(flags.DEFINE_string, 'YT_life', '../speech_data/common_voice',
      help='youtube caption corpus')
    d(flags.DEFINE_integer, 'num_workers', 4, help='dataloader workers')
    d(flags.DEFINE_bool, 'cache_audio', False,
      help='build/mmap a decoded int16 PCM cache per corpus (decode once, '
           'zero host decode work thereafter; int16 H2D, scaled on device)')
    d(flags.DEFINE_bool, 'device_corpus', False,
      help='load the ENTIRE training corpus into device HBM once (int16 '
           'audio + padded labels) and feed the train step by INDEX: the '
           'per-step host->device traffic drops to a few hundred bytes '
           'and the end-to-end loop runs at device rate on any host.  '
           'Fits corpora up to a few GB (audio bytes = 2 * seconds * '
           '16000); trades per-batch length bucketing for global padding, '
           'so best on length-filtered or uniform corpora.  Single-host.')
    # learning (reference rnnt/args.py:36-50)
    d(flags.DEFINE_bool, 'use_pretrained', False,
      help='use wav2vec-pretrained encoder')
    d(flags.DEFINE_enum, 'optim', 'adam', ['adam', 'sgd', 'sm3'],
      help='optimizer')
    d(flags.DEFINE_float, 'lr', 1e-4, help='initial lr')
    d(flags.DEFINE_bool, 'sched', True, help='lr reduce rate on plateau')
    d(flags.DEFINE_integer, 'sched_patience', 1, help='plateau patience')
    d(flags.DEFINE_float, 'sched_factor', 0.5, help='plateau factor')
    d(flags.DEFINE_float, 'sched_min_lr', 1e-6, help='plateau min lr')
    d(flags.DEFINE_integer, 'warmup_step', 10000, help='linear lr warmup')
    d(flags.DEFINE_integer, 'epochs', 30, help='epochs')
    d(flags.DEFINE_integer, 'batch_size', 8, help='batch size')
    d(flags.DEFINE_integer, 'sub_batch_size', 8,
      help='micro-batch size for gradient accumulation')
    d(flags.DEFINE_integer, 'eval_batch_size', 4, help='evaluation batch size')
    d(flags.DEFINE_float, 'gradclip', None, help='clip norm value')
    # encoder (reference rnnt/args.py:52-56)
    d(flags.DEFINE_string, 'enc_type', 'LSTM', help='encoder rnn type')
    d(flags.DEFINE_integer, 'enc_hidden_size', 600, help='encoder hidden dim')
    d(flags.DEFINE_integer, 'enc_layers', 4, help='encoder layers')
    d(flags.DEFINE_integer, 'enc_proj_size', 600, help='encoder proj size')
    d(flags.DEFINE_float, 'enc_dropout', 0, help='encoder dropout')
    # decoder (reference rnnt/args.py:58-61)
    d(flags.DEFINE_integer, 'dec_hidden_size', 150, help='decoder hidden dim')
    d(flags.DEFINE_integer, 'dec_layers', 2, help='decoder layers')
    d(flags.DEFINE_integer, 'dec_proj_size', 150, help='decoder proj size')
    d(flags.DEFINE_float, 'dec_dropout', 0.0, help='decoder dropout')
    # joint
    d(flags.DEFINE_integer, 'joint_size', 512, help='joint hidden dim')
    # tokenizer
    d(flags.DEFINE_enum, 'tokenizer', 'char', ['char', 'bpe'],
      help='tokenizer')
    d(flags.DEFINE_integer, 'bpe_size', 256, help='BPE vocabulary size')
    d(flags.DEFINE_integer, 'vocab_embed_size', 16,
      help='vocabulary embedding size')
    # data preprocess (reference rnnt/args.py:68-82)
    d(flags.DEFINE_float, 'audio_max_length', 14, help='max len in seconds')
    d(flags.DEFINE_enum, 'feature', 'mfcc', ['mfcc', 'melspec', 'logfbank'],
      help='audio feature')
    d(flags.DEFINE_integer, 'feature_size', 80, help='mel bins')
    d(flags.DEFINE_integer, 'n_fft', 400, help='spectrogram')
    d(flags.DEFINE_integer, 'win_length', 400, help='spectrogram')
    d(flags.DEFINE_integer, 'hop_length', 200, help='spectrogram')
    d(flags.DEFINE_bool, 'delta', False, help='concat deltas')
    d(flags.DEFINE_bool, 'cmvn', False, help='normalize spectrogram')
    d(flags.DEFINE_integer, 'downsample', 3, help='frame stacking factor')
    d(flags.DEFINE_integer, 'T_mask', 50, help='SpecAugment time mask width')
    d(flags.DEFINE_integer, 'T_num_mask', 2, help='SpecAugment time masks')
    d(flags.DEFINE_integer, 'F_mask', 5, help='SpecAugment freq mask width')
    d(flags.DEFINE_integer, 'F_num_mask', 1, help='SpecAugment freq masks')
    # mixed precision (apex flags accepted for flagfile compat; on TPU they
    # map to bf16 compute + fp32 params — reference rnnt/args.py:84-85)
    d(flags.DEFINE_bool, 'apex', True, help='mixed precision (bf16 on TPU)')
    d(flags.DEFINE_string, 'opt_level', 'O1', help='accepted for compat')
    # parallel
    d(flags.DEFINE_bool, 'multi_gpu', False,
      help='accepted for compat; TPU path always uses the device mesh')
    # log
    d(flags.DEFINE_integer, 'loss_step', 5, help='loss report frequency')
    d(flags.DEFINE_integer, 'save_step', 10000, help='checkpoint frequency')
    d(flags.DEFINE_integer, 'keep_checkpoints', 0,
      help='keep only the newest N step checkpoints (0 = keep all, '
           'the reference behavior); best.ckpt is never pruned')
    d(flags.DEFINE_integer, 'eval_step', 10000, help='eval frequency')
    d(flags.DEFINE_integer, 'sample_size', 20, help='visualized examples')
    d(flags.DEFINE_integer, 'eval_beam_width', 0,
      help='also report beam-search WER during eval with this beam width '
           '(0 = greedy only, the reference behavior; beam+LM measured '
           '24% relative WER win over greedy, tests/test_beam_gain.py)')

    # ---- TPU-native additions (not in the reference) ----
    d(flags.DEFINE_integer, 'dp_size', -1,
      help='data-parallel mesh size; -1 = all devices')
    d(flags.DEFINE_integer, 'tp_size', 1,
      help='tensor-parallel mesh size for the joint/vocab projection')
    d(flags.DEFINE_integer, 'pp_size', 1,
      help='pipeline-parallel mesh size: the encoder\'s uniform tail '
           'layers shard over pp stages (GPipe schedule, '
           'parallel/pipeline.py); gradient-accumulation microbatches '
           'stream through the stages')
    d(flags.DEFINE_bool, 'bf16', True, help='bf16 activations/compute')
    d(flags.DEFINE_integer, 'audio_bucket_frames', 128,
      help='pad encoder T to a multiple of this (static-shape buckets)')
    d(flags.DEFINE_integer, 'label_bucket', 16,
      help='pad label U to a multiple of this (static-shape buckets)')
    d(flags.DEFINE_string, 'logdir_root', 'logs', help='run log root')
    d(flags.DEFINE_integer, 'time_warp_w', 0,
      help='SpecAugment time-warp W (legacy TimeWrap equivalent; 0 = off)')
    d(flags.DEFINE_string, 'profile_dir', None,
      help='write jax.profiler traces here during training')
    d(flags.DEFINE_string, 'compilation_cache_dir',
      os.path.expanduser('~/.cache/edgedict_tpu_xla'),
      help='persistent XLA compilation cache (empty string disables); '
           'makes the big train-step compile a one-time cost across runs')


define_flags()


def ensure_parsed(argv=None):
    """Parse flags if they have not been parsed yet (library use)."""
    if not FLAGS.is_parsed():
        FLAGS(argv or ['edgedict_tpu'])
    return FLAGS


def enable_compilation_cache():
    """Point jax at the persistent XLA compilation cache (called by the
    CLIs after flag parsing); big-model train steps then compile once per
    machine instead of once per process."""
    import jax
    cache_dir = FLAGS.compilation_cache_dir
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception as e:           # cache is best-effort
        print(f'compilation cache disabled: {e}')
