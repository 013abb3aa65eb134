"""Raw-waveform fine-tune trainer (reference cli/train.py:55-385).

Differences from the feature-based Trainer: the featurizer is a TRAINABLE
causal-conv FrontEnd (input_size = its last channel count, no in-encoder
time reduction — reference cli/train.py:107-126), frame lengths are derived
from the conv stride ratio (:234-242), and the FrontEnd + encoder can be
initialized from a wav2vec pretraining checkpoint (:38-53
load_pretrained_model).
"""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.models import transducer as T
from edgedict_tpu.models import wav2vec as W
from edgedict_tpu.parallel import (
    make_eval_step, make_train_state, make_train_step)
from edgedict_tpu.trainer import Trainer


def _unstate(obj):
    """flax msgpack state-dict → pytree (string-int-keyed dicts → lists)."""
    if isinstance(obj, dict):
        if obj and all(k.isdigit() for k in obj):
            return [_unstate(obj[str(i)]) for i in range(len(obj))]
        return {k: _unstate(v) for k, v in obj.items()}
    return obj


def load_wav2vec_params(path):
    """Raw-load a pretraining checkpoint (no template needed)."""
    from flax import serialization
    with open(path, 'rb') as f:
        restored = serialization.msgpack_restore(f.read())
    return _unstate(restored['model'])


class RawTrainer(Trainer):
    FRONTEND_SPEC = W.DEFAULT_FRONTEND

    def _build_model_and_steps(self):
        FLAGS = self.FLAGS
        if self.mesh.shape.get('pp', 1) > 1:
            raise NotImplementedError(
                'pipeline parallelism (--pp_size) is wired for the '
                'feature-based trainer only; the raw-waveform FrontEnd '
                'path trains with dp/tp')
        spec = self.FRONTEND_SPEC
        embed = spec[-1][2]
        self.feature_cfg = None
        self.pipeline = None
        import dataclasses
        base = T.TransducerConfig.from_flags(
            FLAGS, vocab_size=self.tokenizer.vocab_size, input_size=embed)
        # no in-encoder time reduction on the raw path (cli/train.py:107-126)
        self.cfg = dataclasses.replace(base, enc_time_reductions=())

        def init_fn(key, _cfg=None):
            k1, k2 = jax.random.split(key)
            params = T.transducer_init(k1, self.cfg)
            params['frontend'] = W.frontend_init(k2, spec, bias=True)
            return params

        self.state = make_train_state(
            jax.random.PRNGKey(0), self.cfg, self.optimizer, self.mesh,
            init_fn=lambda key, cfg=None: init_fn(key))

        cfg = self.cfg

        def feature_fn(params, batch):
            from edgedict_tpu.features import pcm_to_float
            xs = W.frontend_apply(params['frontend'],
                                  pcm_to_float(batch['audio']), spec)
            # xlen from the conv stride ratio (cli/train.py:234-242)
            ratio = batch['audio'].shape[1] / xs.shape[1]
            xlen = jnp.ceil(batch['alen'].astype(jnp.float32)
                            / ratio).astype(jnp.int32)
            xlen = jnp.minimum(xlen, xs.shape[1])
            return xs, xlen

        compute_dtype = jnp.bfloat16 if FLAGS.bf16 else jnp.float32

        def loss_fn(params, micro, rng, aux):
            del aux
            xs, xlen = feature_fn(params, micro)
            return T.transducer_loss(
                params, cfg, xs.astype(compute_dtype), micro['ys'], xlen,
                micro['ylen'], deterministic=False, rng=rng)

        self.train_step = make_train_step(
            cfg, self.optimizer, self.mesh, bf16=FLAGS.bf16,
            loss_fn=loss_fn, batch_keys=('audio', 'alen', 'ys', 'ylen'))
        self.eval_step = make_eval_step(cfg, self.mesh,
                                        feature_fn=feature_fn)
        # beam eval is a feature-trainer extra (--eval_beam_width); the
        # raw path evaluates greedy-only, but Trainer.evaluate() consults
        # these attributes
        self.beam_eval_step = None
        self.last_beam_wer = None

    def load_pretrained(self, path):
        """Splice wav2vec frontend + encoder weights into the model
        (reference load_pretrained_model, cli/train.py:38-53)."""
        w2v = load_wav2vec_params(path)
        params = jax.device_get(self.state.params)

        def splice(dst, src, name):
            """Per-key merge, like the reference's state_dict update
            (cli/train.py:42-49): keys present in both sides are copied
            (shape-checked); fine-tune-only keys keep their init."""
            if isinstance(dst, dict):
                assert isinstance(src, dict), name
                return {k: splice(dst[k], src[k], f'{name}.{k}')
                        if k in src else dst[k] for k in dst}
            if isinstance(dst, list):
                assert len(dst) == len(src), name
                return [splice(d, s, f'{name}[{i}]')
                        for i, (d, s) in enumerate(zip(dst, src))]
            assert np.shape(dst) == np.shape(src), \
                f'{name}: {np.shape(dst)} vs {np.shape(src)} — pretrain ' \
                f'and fine-tune encoder flags must match'
            return np.asarray(src)

        params['frontend'] = splice(params['frontend'], w2v['frontend'],
                                    'frontend')
        params['encoder'] = splice(params['encoder'], w2v['encoder'],
                                   'encoder')
        from edgedict_tpu.parallel import param_sharding
        shardings = param_sharding(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, shardings)
        self.state = self.state._replace(
            params=params, opt_state=self.optimizer.init(params))
