"""wav2vec 2.0 pretraining orchestration (reference cli/pretrain_wav2vec.py).

Loop shape follows the reference: AdamW with LayerNorm/bias weight-decay
exemption (:26-38), linear warmup + linear decay schedule (:18-24), InfoNCE
contrastive criterion with perplexity/feature penalties (:136-138), Gumbel
temperature annealing per update (:199-202), best-accuracy checkpoint
`pretrained.ckpt` (:213-223, reference saved pretrained_test.pt).

TPU shape: raw audio is cropped to a fixed sample count per batch (static
shapes), span masks are planned on the host with a per-(B,T) deterministic
count, and the whole step (frontend → mask scatter → encoder → VQ →
negatives → InfoNCE) is ONE sharded jit.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from edgedict_tpu.checkpoint import save_checkpoint, snapshot_flags
from edgedict_tpu.models import wav2vec as W
from edgedict_tpu.parallel import (
    make_mesh, make_train_step, shard_batch, TrainState)


def adamw_no_ln_decay(lr, b1, b2, weight_decay, gradclip=None):
    """AdamW whose decoupled weight decay skips biases / norm scales /
    1-D params (reference get_params_without_weight_decay_ln,
    cli/pretrain_wav2vec.py:26-38)."""
    def decay_mask(params):
        return jax.tree.map(lambda p: p.ndim >= 2, params)

    chain = []
    if gradclip:
        chain.append(optax.clip_by_global_norm(gradclip))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2))
    chain.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def linear_warmup_decay(step, warmup, total):
    """lr scale: min(1, step/warmup) · max(0, 1 − step/total)
    (reference get_linear_schedule_with_warmup, :18-24)."""
    s = float(step)
    return min(1.0, s / max(warmup, 1)) * max(0.0, 1.0 - s / max(total, 1))


def crop_audio_batch(samples, crop_len, rng):
    """List of (audio, tokens) → (B, crop_len) float32 with random crops
    (short clips zero-padded) + true lengths."""
    b = len(samples)
    out = np.zeros((b, crop_len), np.float32)
    lens = np.zeros((b,), np.int32)
    for i, (audio, _) in enumerate(samples):
        if len(audio) > crop_len:
            start = rng.randint(0, len(audio) - crop_len + 1)
            out[i] = audio[start:start + crop_len]
            lens[i] = crop_len
        else:
            out[i, :len(audio)] = audio
            lens[i] = len(audio)
    return {'audio': out, 'alen': lens}


class Wav2VecPretrainer:
    def __init__(self, FLAGS, train_dataset, eval_dataset=None, mesh=None):
        self.FLAGS = FLAGS
        self.logdir = os.path.join(FLAGS.logdir_root, FLAGS.name)
        os.makedirs(self.logdir, exist_ok=True)
        # input_size = frontend embed so the encoder consumes conv features
        # directly and its weights splice into the fine-tune Transducer
        # (reference cli/train.py:107-126 uses input_size=128 too)
        self.cfg = W.Wav2VecConfig(
            input_size=W.DEFAULT_FRONTEND[-1][2],
            enc_hidden_size=FLAGS.enc_hidden_size,
            enc_layers=FLAGS.enc_layers,
            enc_dropout=FLAGS.enc_dropout,
            enc_proj_size=FLAGS.enc_proj_size,
            mask_prob=FLAGS.mask_prob, mask_length=FLAGS.mask_length,
            num_negatives=FLAGS.num_negatives,
            latent_vars=FLAGS.latent_vars,
            latent_groups=FLAGS.latent_groups,
            final_dim=FLAGS.final_dim,
            latent_temp=(FLAGS.init_temp, FLAGS.min_temp, FLAGS.temp_decay))
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        if getattr(FLAGS, 'pp_size', 1) > 1:
            raise NotImplementedError(
                'pipeline parallelism (--pp_size) is wired for the '
                'transducer trainer only; wav2vec pretraining uses dp/tp')
        self.mesh = mesh if mesh is not None else make_mesh(
            dp=FLAGS.dp_size, tp=FLAGS.tp_size)
        self.accum_steps = max(1, FLAGS.batch_size // FLAGS.sub_batch_size)

        self.optimizer = optax.inject_hyperparams(
            lambda lr: adamw_no_ln_decay(
                lr, FLAGS.beta1, FLAGS.beta2, FLAGS.weight_decay,
                FLAGS.gradclip))(lr=FLAGS.lr)

        params = W.wav2vec_init(jax.random.PRNGKey(0), self.cfg)
        from edgedict_tpu.parallel import param_sharding
        shardings = param_sharding(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, shardings)
        self.state = TrainState(step=jnp.zeros((), jnp.int32),
                                params=params,
                                opt_state=self.optimizer.init(params))
        # host-side step mirror (avoids a per-step device sync in the loop)
        self.host_step = 0

        cfg = self.cfg

        def loss_fn(params, micro, rng, aux):
            res = W.wav2vec_forward(params, cfg, micro['audio'],
                                    micro['mask_idx'], temp=aux['temp'],
                                    rng=rng, training=True)
            loss, metrics = W.contrastive_loss(
                res, prob_ppl_weight=FLAGS.prob_perplex,
                features_pen_weight=FLAGS.features_pen)
            keep = {k: metrics[k] for k in
                    ('contrastive_loss', 'correct', 'count')
                    if k in metrics}
            if 'prob_perplexity' in metrics:
                keep['prob_perplexity'] = metrics['prob_perplexity']
            return loss, keep

        self.train_step = make_train_step(
            cfg, self.optimizer, self.mesh, bf16=FLAGS.bf16,
            loss_fn=loss_fn, loss_has_aux=True,
            batch_keys=('audio', 'alen', 'mask_idx'))

        def eval_fn(params, batch, rng, temp):
            res = W.wav2vec_forward(params, cfg, batch['audio'],
                                    batch['mask_idx'], temp=temp,
                                    rng=rng, training=False)
            _, metrics = W.contrastive_loss(
                res, prob_ppl_weight=FLAGS.prob_perplex,
                features_pen_weight=FLAGS.features_pen)
            return metrics

        self._eval_fn = jax.jit(eval_fn)
        self._rng = jax.random.PRNGKey(77)
        self._np_rng = np.random.RandomState(0)
        self.best_accuracy = -1.0
        snapshot_flags(FLAGS, self.logdir)

    # ------------------------------------------------------------------
    def plan_masks(self, b, t_frames):
        """Host-side span-mask planning with a (B,T)-deterministic count,
        so the jitted step sees a bounded shape set."""
        cfg = self.cfg
        target = max(2, int(cfg.mask_prob * t_frames / cfg.mask_length))
        mask = W.compute_mask_indices(
            (b, t_frames), None, cfg.mask_prob, cfg.mask_length,
            cfg.mask_selection, min_masks=2, rng=self._np_rng)
        idx = W.mask_to_dense_indices(mask)
        m = idx.shape[1]
        if m >= target:
            sel = np.stack([self._np_rng.choice(m, target, replace=False)
                            for _ in range(b)])
            idx = np.take_along_axis(idx, np.sort(sel, axis=1), axis=1)
        else:
            pad = self._np_rng.randint(0, t_frames, (b, target - m))
            idx = np.concatenate([idx, pad.astype(np.int32)], axis=1)
        return idx

    def make_batch(self, samples):
        F = self.FLAGS
        batch = crop_audio_batch(samples, F.pretrain_audio_samples,
                                 self._np_rng)
        t_frames = W.frontend_output_length(self.cfg.frontend_params,
                                            F.pretrain_audio_samples)
        batch['mask_idx'] = self.plan_masks(len(samples), t_frames)
        return batch

    def run_step(self, batch):
        F = self.FLAGS
        step = self.host_step        # device fetch here would sync per step
        total = F.epochs * max(
            len(self.train_dataset) // F.batch_size, 1)
        lr = F.lr * linear_warmup_decay(step, F.warmup_step, total)
        temp = max(F.init_temp * F.temp_decay ** step, F.min_temp)
        sharded = shard_batch(self.mesh, batch, self.accum_steps)
        self._rng, sub = jax.random.split(self._rng)
        self.state, metrics = self.train_step(
            self.state, sharded, sub, jnp.asarray(lr, jnp.float32),
            {'temp': jnp.asarray(temp, jnp.float32)})
        self.host_step += 1
        return metrics

    def evaluate(self, max_batches=8):
        """Held-out contrastive accuracy (the reference's evaluate(),
        cli/pretrain_wav2vec.py:55-90: best checkpoints track EVAL accuracy,
        not train)."""
        if self.eval_dataset is None:
            return None
        F = self.FLAGS
        correct = count = 0
        loss_sum = n = 0.0
        for start in range(0, min(len(self.eval_dataset),
                                  max_batches * F.eval_batch_size),
                           F.eval_batch_size):
            samples = [self.eval_dataset[i]
                       for i in range(start,
                                      min(start + F.eval_batch_size,
                                          len(self.eval_dataset)))]
            if len(samples) < F.eval_batch_size:
                break
            batch = self.make_batch(samples)
            step = self.host_step
            temp = max(F.init_temp * F.temp_decay ** step, F.min_temp)
            m = self._eval_fn(self.state.params,
                              {k: jnp.asarray(v) for k, v in batch.items()},
                              jax.random.PRNGKey(0),
                              jnp.asarray(temp, jnp.float32))
            correct += float(m['correct'])
            count += float(m['count'])
            loss_sum += float(m['loss'])
            n += 1
        if count == 0:
            return None
        return {'accuracy': correct / count,
                'loss': loss_sum / max(n, 1)}

    def save_best(self, accuracy):
        if accuracy > self.best_accuracy:
            self.best_accuracy = accuracy
            save_checkpoint(self.logdir, int(self.state.step),
                            self.state.params,
                            extra={'accuracy': float(accuracy)})
            # stable name consumed by cli/train.py splice
            import shutil
            src = os.path.join(self.logdir, 'models',
                               f'{int(self.state.step)}.ckpt')
            shutil.copy(src, os.path.join(self.logdir, 'pretrained.ckpt'))
