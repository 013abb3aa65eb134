"""Resume bit-exactness: save → load → continue == uninterrupted run.

The checkpoint carries params, optimizer state, scheduler state, and the
augmentation RNG; on load the trainer also realigns the data stream
(epoch counter = per-epoch shuffle seed, plus a fast-forward over the
batches the checkpointed run already consumed mid-epoch).  Together these
make a resumed run replay EXACTLY the batch/update sequence an
uninterrupted run produces — the property that makes preemption safe.
"""

import numpy as np
import pytest

from edgedict_tpu.config import FLAGS, ensure_parsed
from tests.test_trainer_e2e import _make_corpus


@pytest.fixture()
def resume_env(tmp_path):
    ensure_parsed()
    corpus = _make_corpus(str(tmp_path / 'libri'))
    FLAGS.name = 'resume-test'
    FLAGS.logdir_root = str(tmp_path / 'logs')
    FLAGS.tokenizer = 'char'
    FLAGS.batch_size = 4
    FLAGS.sub_batch_size = 4
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
    FLAGS.warmup_step = 2
    FLAGS.loss_step = 100
    FLAGS.save_step = 1000     # only explicit saves
    FLAGS.eval_step = 1000
    FLAGS.gradclip = 10.0
    FLAGS.dp_size = 1
    FLAGS.tp_size = 1
    return corpus


def _leaf(trainer):
    return np.asarray(trainer.state.params['joint']['out']['b'])


@pytest.mark.slow
def test_resume_matches_uninterrupted(resume_env):
    from edgedict_tpu.data import Librispeech
    from edgedict_tpu.trainer import Trainer, build_tokenizer

    tok = build_tokenizer(FLAGS)
    ds = Librispeech(resume_env, tok, audio_max_length=5)
    tok.build(ds.texts())

    # A: uninterrupted — 5 steps (8 samples / batch 4 = 2 steps/epoch, so
    # step 3 sits mid-epoch: the resume must fast-forward one batch)
    FLAGS.name = 'resume-A'            # separate logdir from the B runs
    a = Trainer(FLAGS, train_datasets=[ds], eval_dataset=None)
    a.train(total_steps=5, log_fn=lambda *_: None)
    ref = _leaf(a)

    # B: 3 steps → save → fresh trainer → load → continue to 5
    FLAGS.name = 'resume-B'
    b1 = Trainer(FLAGS, train_datasets=[ds], eval_dataset=None)
    b1.train(total_steps=3, log_fn=lambda *_: None)
    assert int(b1.state.step) == 3
    np.testing.assert_raises(
        AssertionError, np.testing.assert_allclose, _leaf(b1), ref)

    b2 = Trainer(FLAGS, train_datasets=[ds], eval_dataset=None)
    assert b2.load() == 3
    assert b2._skip_batches == 1          # mid-epoch position restored
    b2.train(total_steps=5, log_fn=lambda *_: None)
    assert int(b2.state.step) == 5

    np.testing.assert_allclose(_leaf(b2), ref, rtol=0, atol=0)
