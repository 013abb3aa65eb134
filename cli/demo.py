"""Live demo over the EXPORTED artifacts (the reference demo.py role: the
OpenVINO live decoder, demo.py:21-116, rebuilt on StableHLO artifacts).

  python -m cli.demo --flagfile logs/<name>/flagfile.txt --path x.wav
  python -m cli.demo --flagfile ... --mic

Run `python -m cli.export` first to produce logs/<name>/export.
"""

import os

import numpy as np
from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_string('path', None, 'decode a wav file and exit')
flags.DEFINE_bool('mic', False, 'stream from the microphone')
flags.DEFINE_integer('demo_reset_step', 200, 'periodic state reset chunks')


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from edgedict_tpu.export import build_exported_decoder
    decoder = build_exported_decoder(FLAGS)
    win, hop = decoder.win_size, decoder.hop_size

    if FLAGS.path:
        from edgedict_tpu.data import load_audio
        audio, sr = load_audio(FLAGS.path)
        assert sr == 16000
        n = (len(audio) - win) // hop + 1
        out = [decoder.decode(audio[i * hop:i * hop + win])
               for i in range(max(n, 0))]
        print(''.join(out))
        return

    assert FLAGS.mic, 'pass --path or --mic'
    import sounddevice as sd
    import time
    buf = np.zeros(0, np.float32)
    chunks = 0

    def callback(indata, frames, t, status):
        nonlocal buf, chunks
        buf = np.concatenate([buf, indata[:, 0].astype(np.float32)])
        while len(buf) >= win:
            text = decoder.decode(buf[:win])
            buf = buf[hop:]
            chunks += 1
            if text:
                print(text, end='', flush=True)
            if FLAGS.demo_reset_step and chunks % FLAGS.demo_reset_step \
                    == 0:
                decoder.reset()

    with sd.InputStream(samplerate=16000, channels=1, callback=callback):
        print('listening (ctrl-c to stop)')
        while True:
            time.sleep(0.1)


if __name__ == '__main__':
    app.run(main)
