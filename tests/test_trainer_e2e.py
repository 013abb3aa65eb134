"""End-to-end: synthetic LibriSpeech-layout corpus → Trainer → train steps →
eval WER → checkpoint save/resume → streaming CLI decoder construction."""

import os

import numpy as np
import pytest

from edgedict_tpu.config import FLAGS, ensure_parsed


def _make_corpus(root, n=8, seconds=1.0, sr=16000):
    """LibriSpeech layout: <root>/<spk>/<chap>/<spk>-<chap>.trans.txt."""
    from edgedict_tpu.data.audio_io import save_wav
    rng = np.random.RandomState(0)
    spk, chap = '1', '2'
    d = os.path.join(root, spk, chap)
    os.makedirs(d, exist_ok=True)
    texts = ['hello world', 'the cat sat', 'a b c d', 'speech test',
             'one two three', 'open the door', 'close the door',
             'turn it off']
    lines = []
    for i in range(n):
        name = f'{spk}-{chap}-{i:04d}'
        t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
        audio = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t) \
            + 0.05 * rng.randn(len(t))
        save_wav(os.path.join(d, name + '.wav'), audio, sr)
        lines.append(f'{name} {texts[i % len(texts)].upper()}')
    with open(os.path.join(d, f'{spk}-{chap}.trans.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return root


@pytest.fixture(scope='module')
def flags_env(tmp_path_factory):
    ensure_parsed()
    tmp = tmp_path_factory.mktemp('e2e')
    corpus = _make_corpus(str(tmp / 'libri'))
    FLAGS.name = 'e2e-test'
    FLAGS.logdir_root = str(tmp / 'logs')
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
    FLAGS.warmup_step = 5
    FLAGS.loss_step = 1
    FLAGS.save_step = 1000
    FLAGS.eval_step = 1000
    FLAGS.gradclip = 10.0
    FLAGS.dp_size = 2
    FLAGS.tp_size = 1
    # shared setup so every test here is self-contained regardless of
    # which tier (slow / fast) ran: tokenizer cache + one saved checkpoint
    from edgedict_tpu.data import Librispeech
    from edgedict_tpu.trainer import Trainer, build_tokenizer
    tok = build_tokenizer(FLAGS)
    ds = Librispeech(corpus, tok, audio_max_length=5)
    tok.build(ds.texts())
    trainer = Trainer(FLAGS, train_datasets=[ds],
                      eval_dataset=None)
    trainer.save()
    return corpus


@pytest.mark.slow
def test_trainer_end_to_end(flags_env):
    from edgedict_tpu.data import Librispeech
    from edgedict_tpu.trainer import Trainer, build_tokenizer

    tok = build_tokenizer(FLAGS)
    train_ds = Librispeech(flags_env, tok, audio_max_length=5)
    assert len(train_ds) == 8

    trainer = Trainer(FLAGS, train_datasets=[train_ds],
                      eval_dataset=Librispeech(flags_env, tok,
                                               audio_max_length=5))
    losses = []
    for batch in trainer.loader:
        m = trainer.run_step(batch)
        losses.append(float(m['loss']))
        if len(losses) >= 3:
            break
    assert all(np.isfinite(losses)), losses

    loss, val_wer = trainer.sanity_check()
    assert np.isfinite(loss)
    assert 0.0 <= val_wer <= 1.5

    # save / resume round trip
    path = trainer.save()
    assert os.path.exists(path)
    step_before = int(trainer.state.step)
    p_before = np.asarray(
        trainer.state.params['joint']['out']['b'])
    trainer2 = Trainer(FLAGS, train_datasets=[train_ds],
                       eval_dataset=None)
    resumed = trainer2.load()
    assert resumed == step_before
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params['joint']['out']['b']), p_before)
    # flag snapshot written (the reference's logdir contract)
    assert os.path.exists(os.path.join(trainer.logdir, 'flagfile.txt'))


def test_stream_cli_decoder_from_trained_logdir(flags_env):
    """cli.stream builds a StreamingDecoder from the logdir contract."""
    from cli.stream import build_stream_decoder
    from edgedict_tpu.data.audio_io import load_audio
    # flags still point at the e2e logdir with a saved checkpoint
    dec = build_stream_decoder(FLAGS)
    wav = os.path.join(flags_env, '1', '2', '1-2-0000.wav')
    audio, sr = load_audio(wav)
    text = dec.decode_wav(audio)
    assert isinstance(text, str)


def test_load_model_only_checkpoint(flags_env):
    """A checkpoint without optimizer state (cli.import_checkpoint output)
    loads into the Trainer with a freshly initialized optimizer."""
    import jax
    from edgedict_tpu.checkpoint import save_checkpoint
    from edgedict_tpu.data import Librispeech
    from edgedict_tpu.trainer import Trainer, build_tokenizer

    tok = build_tokenizer(FLAGS)
    ds = Librispeech(flags_env, tok, audio_max_length=5)
    FLAGS.name = 'model-only'
    trainer = Trainer(FLAGS, train_datasets=[ds], eval_dataset=None)
    save_checkpoint(trainer.logdir, 7, trainer.state.params)   # no optim
    step = trainer.load()
    assert step == 7
    # a train step still runs with the fresh optimizer state
    batch = next(iter(trainer.loader))
    m = trainer.run_step(batch)
    assert np.isfinite(float(m['loss']))


def test_eval_beam_wer_flag(flags_env):
    """--eval_beam_width > 0: evaluate() additionally reports beam-search
    WER (last_beam_wer), the trainer-visible surface for the measured
    beam-over-greedy accuracy win (tests/test_beam_gain.py; the reference
    evaluates greedy only, cli/baseline.py:271-285)."""
    from edgedict_tpu.data import Librispeech
    from edgedict_tpu.trainer import Trainer, build_tokenizer

    tok = build_tokenizer(FLAGS)
    ds = Librispeech(flags_env, tok, audio_max_length=5)
    FLAGS.name = 'beam-eval'
    old = FLAGS.eval_beam_width
    FLAGS.eval_beam_width = 2
    try:
        trainer = Trainer(FLAGS, train_datasets=[ds], eval_dataset=ds)
        assert trainer.beam_eval_step is not None
        loss, greedy_wer = trainer.evaluate(max_batches=1)
        assert np.isfinite(loss)
        assert trainer.last_beam_wer is not None
        assert 0.0 <= trainer.last_beam_wer <= 2.0
        # flag off -> no beam pass, no beam WER
        FLAGS.eval_beam_width = 0
        trainer2 = Trainer(FLAGS, train_datasets=[ds], eval_dataset=ds)
        assert trainer2.beam_eval_step is None
        trainer2.evaluate(max_batches=1)
        assert trainer2.last_beam_wer is None
    finally:
        FLAGS.eval_beam_width = old
