"""Common Voice prep (reference preprocess/preprocess_common_voice.py:19-31):
convert clips/*.mp3 → 16 kHz mono wav via ffmpeg, in parallel.

  python -m preprocess.preprocess_common_voice --root ../common_voice
"""

import argparse
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor


def convert(mp3_path):
    wav_path = mp3_path[:-4] + '.wav'
    if os.path.exists(wav_path):
        return True
    import shutil
    if not shutil.which('ffmpeg'):     # mp3 needs ffmpeg; fail per-clip
        return False
    return subprocess.call(
        ['ffmpeg', '-loglevel', 'quiet', '-y', '-i', mp3_path,
         '-ar', '16000', '-ac', '1', wav_path]) == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--workers', type=int, default=os.cpu_count())
    args = ap.parse_args()
    clips = os.path.join(args.root, 'clips')
    mp3s = [os.path.join(clips, f) for f in os.listdir(clips)
            if f.endswith('.mp3')]
    print(f'converting {len(mp3s)} clips')
    with ThreadPoolExecutor(args.workers) as ex:
        results = list(ex.map(convert, mp3s))
    print(f'done: {sum(results)} ok, {len(results) - sum(results)} failed')


if __name__ == '__main__':
    main()
