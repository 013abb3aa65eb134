"""wav2vec pretrain → fine-tune A/B on the synthetic language (VERDICT
round 4 item 2b): does pretraining actually HELP, the way the reference's
`--use_pretrained` splice intends (/root/reference/cli/train.py:38-53)?

Protocol (low-resource fine-tune, the setting wav2vec 2.0 exists for):
  1. PRETRAIN on `--unlabeled_n` UNLABELED hard-tier tone-word clips for
     `--pretrain_steps` (Wav2VecPretrainer: conv FrontEnd → masks → LSTM
     encoder → Gumbel VQ → InfoNCE), save pretrained.ckpt;
  2. FINE-TUNE the raw-waveform transducer (RawTrainer: trainable
     FrontEnd, no spectral features) on only `--labeled_n` labeled
     utterances for `--finetune_steps`, TWICE from the same rng/data
     order: (a) random init, (b) frontend+encoder spliced from step 1;
  3. report held-out WER for both and the relative gain.

Same FLAGS drive both phases so the splice shapes match.  Prints one JSON
line; exits 0 when the pretrained leg beats random init.

  python -m scripts.pretrain_finetune_ab            # on the TPU
  python -m scripts.pretrain_finetune_ab --tiny     # CPU smoke
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pretrain_steps', type=int, default=400)
    ap.add_argument('--finetune_steps', type=int, default=200)
    ap.add_argument('--unlabeled_n', type=int, default=512)
    ap.add_argument('--labeled_n', type=int, default=32)
    ap.add_argument('--eval_n', type=int, default=48)
    ap.add_argument('--logdir', default='/tmp/edgedict_pretrain_ab')
    ap.add_argument('--lr', type=float, default=2e-3)
    ap.add_argument('--tiny', action='store_true',
                    help='shrink everything: CPU smoke of the protocol')
    args = ap.parse_args()
    if args.tiny:
        args.pretrain_steps = 6
        args.finetune_steps = 6
        args.unlabeled_n = 16
        args.labeled_n = 8
        args.eval_n = 8

    import jax
    import shutil
    try:
        cache = os.path.expanduser('~/.cache/edgedict_tpu_xla')
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass

    from edgedict_tpu.config import ensure_parsed
    from edgedict_tpu.pretrain_config import FLAGS
    from edgedict_tpu.tokenizer import CharTokenizer
    from scripts.synthetic_convergence import ToyCorpus

    if os.path.exists(args.logdir):
        shutil.rmtree(args.logdir)
    ensure_parsed(['pretrain_ab'])
    FLAGS.name = 'ab'
    FLAGS.logdir_root = args.logdir
    FLAGS.tokenizer = 'char'
    # one encoder config for both phases (the splice is shape-checked)
    FLAGS.enc_hidden_size = 64 if args.tiny else 256
    FLAGS.enc_layers = 2 if args.tiny else 3
    FLAGS.enc_proj_size = 64 if args.tiny else 256
    FLAGS.dec_hidden_size = 64
    FLAGS.dec_layers = 1
    FLAGS.dec_proj_size = 64
    FLAGS.joint_size = 64 if args.tiny else 128
    FLAGS.vocab_embed_size = 16
    FLAGS.batch_size = 8 if args.tiny else 16
    FLAGS.sub_batch_size = FLAGS.batch_size
    FLAGS.eval_batch_size = 8
    FLAGS.lr = args.lr
    FLAGS.warmup_step = max(args.finetune_steps // 8, 2)
    FLAGS.gradclip = 5.0
    FLAGS.loss_step = 50
    FLAGS.save_step = 10 ** 9
    FLAGS.eval_step = 10 ** 9
    FLAGS.epochs = 10 ** 6          # step-bounded below, not epoch-bounded
    FLAGS.dp_size = 1
    FLAGS.tp_size = 1
    FLAGS.pretrain_audio_samples = 8000 if args.tiny else 24000
    # small-encoder VQ: fewer latents than the 320-var default keeps the
    # codebook learnable from 512 clips
    FLAGS.latent_vars = 40
    FLAGS.final_dim = 64
    FLAGS.mask_length = 4
    FLAGS.mask_prob = 0.3

    os.makedirs(os.path.join(args.logdir, 'char'), exist_ok=True)
    tok = CharTokenizer(cache_dir=os.path.join(args.logdir, 'char'))
    labeled = ToyCorpus(tok, args.labeled_n, seed=0, language='hard',
                        snr_db=[20.0, 10.0])
    unlabeled = ToyCorpus(tok, args.unlabeled_n, seed=7, language='hard',
                          snr_db=[20.0, 10.0])
    heldout = ToyCorpus(tok, args.eval_n, seed=1, language='hard',
                        snr_db=[20.0, 10.0])
    tok.build(labeled.texts() + heldout.texts())

    # ---- phase 1: pretrain on UNLABELED audio ---------------------------
    from edgedict_tpu.pretrainer import Wav2VecPretrainer
    pre = Wav2VecPretrainer(FLAGS, unlabeled, eval_dataset=unlabeled)
    t0 = time.time()
    idx = np.arange(len(unlabeled))
    rng = np.random.RandomState(3)
    step = 0
    while step < args.pretrain_steps:
        rng.shuffle(idx)
        for start in range(0, len(idx) - FLAGS.batch_size + 1,
                           FLAGS.batch_size):
            samples = [unlabeled[i]
                       for i in idx[start:start + FLAGS.batch_size]]
            m = pre.run_step(pre.make_batch(samples))
            step = pre.host_step
            if step % 100 == 0:
                acc = (float(m['correct']) / max(float(m['count']), 1))
                print(f'pretrain step {step} loss '
                      f'{float(m["loss"]):.3f} acc {acc:.3f}', flush=True)
            if step >= args.pretrain_steps:
                break
    ev = pre.evaluate()
    pre.save_best(ev['accuracy'] if ev else 0.0)
    pre_path = os.path.join(args.logdir, 'ab', 'pretrained.ckpt')
    print(f'pretrained: {args.pretrain_steps} steps in '
          f'{time.time() - t0:.0f}s, contrastive acc '
          f'{ev["accuracy"] if ev else float("nan"):.3f}', flush=True)

    # ---- phase 2: fine-tune twice at a fixed budget ---------------------
    from edgedict_tpu.raw_trainer import RawTrainer

    def finetune(use_pretrained):
        FLAGS.name = 'ft_pre' if use_pretrained else 'ft_rand'
        tr = RawTrainer(FLAGS, train_datasets=[labeled],
                        eval_dataset=heldout)
        if use_pretrained:
            tr.load_pretrained(pre_path)
        losses = []
        step = 0
        while step < args.finetune_steps:
            for batch in tr.loader:
                m = tr.run_step(batch)
                step = tr._host_step
                if step % 50 == 0:
                    losses.append(round(float(m['loss']), 3))
                if step >= args.finetune_steps:
                    break
        loss, wer = tr.evaluate()
        print(f'finetune[{FLAGS.name}]: loss curve {losses} '
              f'held-out loss {loss:.3f} WER {wer:.4f}', flush=True)
        return {'wer': wer, 'loss': loss, 'curve': losses}

    rand = finetune(False)
    pret = finetune(True)

    out = {
        'metric': 'pretrain_finetune_ab',
        'pretrain_steps': args.pretrain_steps,
        'finetune_steps': args.finetune_steps,
        'unlabeled_n': args.unlabeled_n,
        'labeled_n': args.labeled_n,
        'contrastive_accuracy': round(ev['accuracy'], 4) if ev else None,
        'wer_random_init': round(rand['wer'], 4),
        'wer_pretrained': round(pret['wer'], 4),
        'loss_random_init': round(rand['loss'], 4),
        'loss_pretrained': round(pret['loss'], 4),
        'relative_wer_gain': round(
            (rand['wer'] - pret['wer']) / max(rand['wer'], 1e-9), 4),
    }
    print(json.dumps(out), flush=True)
    return 0 if (args.tiny or pret['wer'] < rand['wer']) else 1


if __name__ == '__main__':
    sys.exit(main())
