"""wav2vec pretraining → fine-tune splice end-to-end on tiny synthetic data."""

import os

import numpy as np
import pytest

from edgedict_tpu.pretrain_config import FLAGS


class _ToyAudioDataset:
    """Minimal dataset: (audio, tokens) samples + data index for sorting."""

    tokenizer = None

    def __init__(self, n=8, length=6000):
        rng = np.random.RandomState(0)
        self.samples = [
            (0.1 * rng.randn(length).astype(np.float32),
             np.asarray([4, 5, 6], np.int32))
            for _ in range(n)]
        self.data = [{'audio_length': 1} for _ in range(n)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    def texts(self):
        return ['a b c'] * len(self.samples)


@pytest.fixture(scope='module')
def pretrain_flags(tmp_path_factory):
    from edgedict_tpu.config import ensure_parsed
    ensure_parsed()
    tmp = tmp_path_factory.mktemp('pretrain')
    FLAGS.name = 'w2v-test'
    FLAGS.logdir_root = str(tmp / 'logs')
    FLAGS.batch_size = 4
    FLAGS.sub_batch_size = 2
    FLAGS.enc_hidden_size = 16
    FLAGS.enc_layers = 2
    FLAGS.enc_proj_size = 16
    FLAGS.enc_dropout = 0.0
    FLAGS.num_negatives = 4
    FLAGS.latent_vars = 8
    FLAGS.latent_groups = 2
    FLAGS.final_dim = 8
    FLAGS.pretrain_audio_samples = 4000
    FLAGS.mask_prob = 0.4
    FLAGS.mask_length = 3
    FLAGS.dp_size = 2
    FLAGS.tp_size = 1
    FLAGS.gradclip = 10.0
    return FLAGS


@pytest.mark.slow
def test_pretrain_and_splice(pretrain_flags):
    from edgedict_tpu.pretrainer import Wav2VecPretrainer
    from edgedict_tpu.models import wav2vec as W

    ds = _ToyAudioDataset()
    pre = Wav2VecPretrainer(FLAGS, ds)
    losses = []
    for i in range(3):
        batch = pre.make_batch([ds[j] for j in range(4)])
        metrics = pre.run_step(batch)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses)), losses
    acc = float(metrics['correct']) / float(metrics['count'])
    pre.save_best(acc)
    ckpt = os.path.join(pre.logdir, 'pretrained.ckpt')
    assert os.path.exists(ckpt)

    # fine-tune splice: frontend + encoder weights land in the transducer
    FLAGS.tokenizer = 'char'
    FLAGS.vocab_embed_size = 8
    FLAGS.dec_hidden_size = 16
    FLAGS.dec_layers = 1
    FLAGS.dec_proj_size = 16
    FLAGS.joint_size = 16
    from edgedict_tpu.raw_trainer import RawTrainer
    from edgedict_tpu.tokenizer import CharTokenizer
    tok = CharTokenizer(cache_dir=os.path.join(FLAGS.logdir_root, 'char'))
    tok.build(['hello world'])
    trainer = RawTrainer(FLAGS, train_datasets=[ds], eval_dataset=None)
    before = np.array(trainer.state.params['encoder']['norm']['scale'])
    trainer.load_pretrained(ckpt)
    after = np.asarray(trainer.state.params['encoder']['norm']['scale'])
    w2v_scale = np.asarray(pre.state.params['encoder']['norm']['scale'])
    np.testing.assert_allclose(after, w2v_scale)

    # raw-path train step + eval run end to end
    batch = {
        'audio': np.stack([ds[i][0][:4000] for i in range(4)]),
        'alen': np.full((4,), 4000, np.int32),
        'ys': np.stack([ds[i][1] for i in range(4)]),
        'ylen': np.full((4,), 3, np.int32),
    }
    m = trainer.run_step(batch)
    assert np.isfinite(float(m['loss']))
    import jax
    from edgedict_tpu.parallel import batch_sharding
    dev = {k: jax.device_put(v, batch_sharding(trainer.mesh, False))
           for k, v in batch.items()}
    loss, y_seq, out_len = trainer.eval_step(trainer.state.params, dev)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_pretrainer_evaluate(pretrain_flags):
    from edgedict_tpu.pretrainer import Wav2VecPretrainer
    ds = _ToyAudioDataset()
    eval_ds = _ToyAudioDataset(n=4)
    FLAGS.name = 'w2v-eval-test'
    pre = Wav2VecPretrainer(FLAGS, ds, eval_ds)
    batch = pre.make_batch([ds[j] for j in range(4)])
    pre.run_step(batch)
    ev = pre.evaluate()
    assert ev is not None
    assert 0.0 <= ev['accuracy'] <= 1.0
    assert np.isfinite(ev['loss'])
