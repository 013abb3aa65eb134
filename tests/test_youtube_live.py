"""The youtube_live runtime core (cli/youtube_live.py:caption_stream),
driven by fake demuxers — the rolling-buffer window/hop math, NaN guard,
silence reset and periodic reset of reference youtube_live.py:88-131,
executed without any network or PyAV."""

import numpy as np

from cli.youtube_live import caption_stream


class FakeDecoder:
    """Records every chunk it is asked to decode; emits scripted text."""

    def __init__(self, win_size, hop_size, texts=None):
        self.win_size = win_size
        self.hop_size = hop_size
        self.chunks = []
        self.resets = 0
        self.texts = list(texts or [])

    def decode(self, chunk):
        self.chunks.append(np.array(chunk))
        return self.texts.pop(0) if self.texts else ''

    def reset(self):
        self.resets += 1


def _feed(pcm, sizes):
    """Split a 1-D stream into pieces of the given sizes (fake demuxer
    frames of irregular length, like resampled PyAV packets)."""
    out, i = [], 0
    for s in sizes:
        out.append(pcm[i:i + s])
        i += s
    assert i == len(pcm)
    return out


def test_window_hop_math():
    """Chunks are exactly the sliding windows of the concatenated stream:
    window i covers samples [i*hop, i*hop + win), regardless of how the
    demuxer fragments the pcm (reference youtube_live.py:88-92)."""
    win, hop = 100, 60
    pcm = np.arange(1000, dtype=np.float32)
    dec = FakeDecoder(win, hop)
    stats = caption_stream(dec, _feed(pcm, [3, 250, 1, 400, 346]),
                           reset_step=0, reset_after=9999,
                           emit=lambda *a, **k: None)
    n_expected = (len(pcm) - win) // hop + 1
    assert stats['chunks_done'] == n_expected
    assert len(dec.chunks) == n_expected
    for i, chunk in enumerate(dec.chunks):
        np.testing.assert_array_equal(chunk, pcm[i * hop:i * hop + win])


def test_nan_guard_skips_only_poisoned_windows():
    """Windows containing non-finite samples are skipped (not decoded)
    but the buffer still advances by hop — later clean windows decode at
    their correct offsets (reference youtube_live.py:111-121)."""
    win, hop = 100, 100       # non-overlapping for an easy poison map
    pcm = np.arange(500, dtype=np.float32)
    pcm[250] = np.nan         # poisons exactly window 2 ([200, 300))
    emitted = []
    dec = FakeDecoder(win, hop)
    stats = caption_stream(dec, _feed(pcm, [500]), reset_step=0,
                           reset_after=9999,
                           emit=lambda s, **k: emitted.append(s))
    assert stats['nan_skipped'] == 1
    assert stats['chunks_done'] == 4
    starts = [int(c[0]) for c in dec.chunks]
    assert starts == [0, 100, 300, 400]
    assert '[NAN]' in emitted


def test_silence_reset_policy():
    """`reset_after` consecutive non-progressing chunks reset the decoder
    and print [Background] (reference youtube_live.py:125-128)."""
    win, hop = 10, 10
    pcm = np.zeros(120, np.float32)
    emitted = []
    dec = FakeDecoder(win, hop)   # scripted texts empty -> always blank
    stats = caption_stream(dec, _feed(pcm, [120]), reset_step=0,
                           reset_after=5,
                           emit=lambda s, **k: emitted.append(s))
    assert stats['chunks_done'] == 12
    assert stats['silence_resets'] == 2      # 12 blanks / 5
    assert dec.resets == 2
    assert emitted.count('\n[Background]') == 2


def test_periodic_reset_policy():
    """A periodic reset fires every `reset_step` decoded chunks even when
    text keeps flowing (reference youtube_live.py:21, demo.py:182-185)."""
    win, hop = 10, 10
    pcm = np.zeros(170, np.float32)
    dec = FakeDecoder(win, hop, texts=['x'] * 17)
    stats = caption_stream(dec, _feed(pcm, [170]), reset_step=5,
                           reset_after=9999,
                           emit=lambda *a, **k: None)
    assert stats['chunks_done'] == 17
    assert stats['periodic_resets'] == 3
    assert dec.resets == 3
    assert stats['silence_resets'] == 0


def test_beam_decoder_full_hypothesis_semantics():
    """Beam decoders return the CURRENT FULL hypothesis: progress means
    the text changed, and the emitted line rewrites in place ('\\r')."""
    win, hop = 10, 10
    pcm = np.zeros(50, np.float32)
    emitted = []
    dec = FakeDecoder(win, hop, texts=['a', 'ab', 'ab', 'abc', 'abc'])
    dec.beam = object()       # marks it as a beam decoder
    stats = caption_stream(dec, _feed(pcm, [50]), reset_step=0,
                           reset_after=9999,
                           emit=lambda s, **k: emitted.append(s))
    assert stats['chunks_done'] == 5
    rewrites = [e for e in emitted if e.startswith('\r')]
    assert [e.strip() for e in rewrites] == ['a', 'ab', 'abc']


def test_caption_stream_with_real_streaming_decoder():
    """End to end: a real (tiny) StreamingDecoder fed sine pcm through the
    caption loop — the production decode path executes under the
    youtube_live buffering math."""
    import jax

    from edgedict_tpu.features import FeatureConfig
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.stream import StreamingDecoder

    class Tok:
        unk_id = 3

        def id_to_token(self, i):
            return chr(ord('a') + i % 26)

    cfg = T.TransducerConfig(
        vocab_size=16, vocab_embed_size=8, input_size=9,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
        joint_size=16, enc_time_reductions=(0,))
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
        hop_length=20, downsample=3, pad_to_divisible=False)
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)
    dec = StreamingDecoder(params, cfg, feature_cfg, Tok(), step_n_frame=2)

    sr = 16000
    t = np.linspace(0, 0.2, int(sr * 0.2), endpoint=False)
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    frames = _feed(pcm, [640] * (len(pcm) // 640))
    stats = caption_stream(dec, frames, reset_step=7, reset_after=3,
                           emit=lambda *a, **k: None)
    n_expected = (len(pcm) - dec.win_size) // dec.hop_size + 1
    assert stats['chunks_done'] == n_expected
    assert stats['nan_skipped'] == 0
