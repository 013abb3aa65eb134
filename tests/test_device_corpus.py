"""Device-resident corpus (--device_corpus, trainer.py): the whole
training set lives in HBM (int16 audio + padded labels) and the step loop
ships only index arrays.  With uniform utterance lengths the on-device
gather assembles the SAME padded batches the host loader would — so the
two paths must produce bit-identical losses and updated params, in the
same data order (resume replay included)."""

import os

import numpy as np
import pytest

from edgedict_tpu.config import FLAGS, ensure_parsed

from tests.test_trainer_e2e import _make_corpus


@pytest.fixture()
def flags_env(tmp_path):
    ensure_parsed()
    corpus = _make_corpus(str(tmp_path / 'libri'), n=8, seconds=1.0)
    FLAGS.name = 'dc-test'
    FLAGS.logdir_root = str(tmp_path / 'logs')
    FLAGS.tokenizer = 'char'
    FLAGS.batch_size = 4
    FLAGS.sub_batch_size = 2
    FLAGS.eval_batch_size = 2
    FLAGS.enc_hidden_size = 16
    FLAGS.enc_layers = 2
    FLAGS.enc_proj_size = 16
    FLAGS.dec_hidden_size = 16
    FLAGS.dec_layers = 1
    FLAGS.dec_proj_size = 16
    FLAGS.joint_size = 16
    FLAGS.vocab_embed_size = 8
    FLAGS.feature = 'logfbank'
    FLAGS.feature_size = 8
    FLAGS.n_fft = 256
    FLAGS.win_length = 256
    FLAGS.hop_length = 128
    FLAGS.downsample = 3
    FLAGS.audio_bucket_frames = 16
    FLAGS.label_bucket = 16
    FLAGS.audio_max_length = 2.0
    FLAGS.lr = 1e-3
    FLAGS.warmup_step = 2
    FLAGS.gradclip = 5.0
    FLAGS.epochs = 1
    FLAGS.dp_size = 1
    FLAGS.tp_size = 1
    FLAGS.cache_audio = True
    yield corpus
    FLAGS.cache_audio = False
    FLAGS.device_corpus = False


def _two_steps(corpus, device_corpus):
    import jax
    from edgedict_tpu.trainer import Trainer
    FLAGS.device_corpus = device_corpus
    FLAGS.name = f'dc-{device_corpus}'
    from edgedict_tpu.data import Librispeech
    from edgedict_tpu.tokenizer import CharTokenizer
    tok = CharTokenizer(cache_dir=os.path.join(FLAGS.logdir_root, 'char'))
    try:
        tok.load()
    except FileNotFoundError:
        pass
    ds = Librispeech(corpus, tok, audio_max_length=2.0, cache_audio=True)
    if getattr(tok, 'token2id', None) is None:
        tok.build(ds.texts())
    tr = Trainer(FLAGS, train_datasets=[ds], eval_dataset=None)
    losses = []
    it = iter(tr.loader)
    for _ in range(2):
        m = tr.run_step(next(it))
        losses.append(float(m['loss']))
    return losses, jax.device_get(tr.state.params)


def test_device_corpus_matches_host_loader(flags_env):
    corpus = flags_env
    host_losses, host_params = _two_steps(corpus, False)
    dc_losses, dc_params = _two_steps(corpus, True)
    # uniform 1 s utterances + uniform bucket rounding → identical padded
    # batches in identical order → bit-identical training
    np.testing.assert_array_equal(np.asarray(host_losses),
                                  np.asarray(dc_losses))
    import jax
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), host_params, dc_params)


def test_device_corpus_index_loader_replays_order(flags_env):
    corpus = flags_env
    from edgedict_tpu.data import DataLoader, Librispeech
    from edgedict_tpu.tokenizer import CharTokenizer
    from edgedict_tpu.trainer import _IndexBatches
    tok = CharTokenizer(cache_dir=os.path.join(FLAGS.logdir_root, 'char'))
    try:
        tok.load()
    except FileNotFoundError:
        pass
    ds = Librispeech(corpus, tok, audio_max_length=2.0)
    a = DataLoader(ds, 4, shuffle=True, drop_last=True)
    b = _IndexBatches(DataLoader(ds, 4, shuffle=True, drop_last=True))
    for _ in range(2):                       # two epochs: same order
        order_a = [list(i) for i in a._batches_indices()]
        a.epoch += 1
        order_b = [list(np.asarray(batch['idx'])) for batch in b]
        assert order_a == order_b
    assert a.epoch == b.epoch == 2
