"""Live-stream captioning CLI (the reference youtube_live.py): resolve a
YouTube live URL, demux/decode/resample the audio, and decode it through
the streaming transducer with the silence-reset policy.

  python -m cli.youtube_live --flagfile logs/<name>/flagfile.txt \
      --url <youtube url>
  python -m cli.youtube_live --flagfile ... --wav x.wav   (offline A/B)

Requires yt-dlp (or youtube-dl) and PyAV for the live path; the --wav
offline path (reference youtube_live.py:45-62) runs anywhere and compares
the jit and exported backends on the same file.
"""

import numpy as np
from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_string('url', None, 'youtube live stream url')
flags.DEFINE_string('wav', None, 'offline A/B decode of a wav file')
flags.DEFINE_integer('yt_reset_step', 200,
                     'periodic state reset, in chunks '
                     '(reference youtube_live.py:21)')
flags.DEFINE_integer('yt_reset_after', 35,
                     'reset after N consecutive blank chunks')


def resolve_stream_url(url):
    try:
        import yt_dlp as youtube_dl
    except ImportError:
        import youtube_dl
    with youtube_dl.YoutubeDL({'format': 'bestaudio/best',
                               'quiet': True}) as ydl:
        info = ydl.extract_info(url, download=False)
    return info['url']


def pcm_frames(container, audio_stream, resampler):
    """Demux/decode/resample a PyAV container into mono float32 16 kHz
    pcm arrays (reference youtube_live.py:103-109)."""
    for frame in container.decode(audio_stream):
        for r in resampler.resample(frame) or []:
            yield r.to_ndarray().reshape(-1).astype(np.float32) / 32768.0


def caption_stream(decoder, pcm_iter, reset_step=200, reset_after=35,
                   emit=None):
    """Rolling-buffer chunking + caption emission + reset policies over an
    iterator of pcm arrays (the runtime core of reference
    youtube_live.py:88-131, factored out of the PyAV loop so a fake
    demuxer can drive it).

    Window/hop math: incoming pcm accumulates in a rolling buffer; every
    time >= win_size samples are buffered the decoder consumes
    buf[:win_size] and the buffer advances by hop_size (consecutive
    chunks overlap by win_size - hop_size samples).  Chunks containing
    non-finite samples are skipped, not decoded (NaN guard,
    youtube_live.py:111-121).  Silence policy: `reset_after` consecutive
    non-progressing chunks reset the decoder ('[Background]'); a periodic
    reset fires every `reset_step` decoded chunks (youtube_live.py:21,
    125-128).

    Returns a stats dict (chunks_done, nan_skipped, silence_resets,
    periodic_resets) so callers/tests can observe the policy decisions."""
    if emit is None:
        emit = lambda s, end='': print(s, end=end, flush=True)  # noqa: E731
    buf = np.zeros(0, np.float32)
    blank_count = 0
    chunks_done = 0
    nan_skipped = 0
    silence_resets = 0
    periodic_resets = 0
    is_beam = hasattr(decoder, 'beam')   # beam returns the FULL hypothesis
    last = ''
    for pcm in pcm_iter:
        buf = np.concatenate([buf, np.asarray(pcm, np.float32)])
        while len(buf) >= decoder.win_size:
            chunk = buf[:decoder.win_size]
            buf = buf[decoder.hop_size:]
            if not np.isfinite(chunk).all():      # NaN guard (yt:111-121)
                nan_skipped += 1
                emit('[NAN]')
                continue
            text = decoder.decode(chunk)
            chunks_done += 1
            progressed = text != last if is_beam else bool(text)
            if is_beam and progressed:
                emit('\r' + text + ' ' * max(len(last) - len(text), 0))
            elif progressed:
                emit(text)
            last = text
            if progressed:
                blank_count = 0
            else:
                blank_count += 1
                if blank_count >= reset_after:
                    emit('\n[Background]')
                    decoder.reset()
                    silence_resets += 1
                    blank_count = 0
                    last = ''
            if reset_step and chunks_done % reset_step == 0:
                decoder.reset()
                periodic_resets += 1
    return {'chunks_done': chunks_done, 'nan_skipped': nan_skipped,
            'silence_resets': silence_resets,
            'periodic_resets': periodic_resets}


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from cli.stream import build_stream_decoder
    decoder = build_stream_decoder(FLAGS)

    if FLAGS.wav:
        # offline A/B of the live and exported backends on one file
        # (reference youtube_live.py:45-62 compares Pytorch vs OpenVINO)
        import os

        from edgedict_tpu.data import load_audio
        audio, sr = load_audio(FLAGS.wav)
        assert sr == 16000
        print('[jit]', decoder.decode_wav(audio))
        export_dir = os.path.join(FLAGS.logdir_root, FLAGS.name, 'export')
        if os.path.isdir(export_dir):
            from edgedict_tpu.export import build_exported_decoder
            exp = build_exported_decoder(FLAGS, export_dir)
            n = max((len(audio) - exp.win_size) // exp.hop_size + 1, 0)
            text = ''.join(
                exp.decode(audio[i * exp.hop_size:
                                 i * exp.hop_size + exp.win_size])
                for i in range(n))
            print('[exported]', text)
        return

    assert FLAGS.url, 'pass --url or --wav'
    import av
    stream_url = resolve_stream_url(FLAGS.url)
    container = av.open(stream_url)
    audio_stream = next(s for s in container.streams if s.type == 'audio')
    resampler = av.AudioResampler(format='s16', layout='mono', rate=16000)
    caption_stream(decoder, pcm_frames(container, audio_stream, resampler),
                   reset_step=FLAGS.yt_reset_step,
                   reset_after=FLAGS.yt_reset_after)


if __name__ == '__main__':
    app.run(main)
