"""LibriSpeech corpus prep (reference preprocess/preprocess_libri_speech.py):
download + extract the archives and convert .flac → 16 kHz mono .wav so the
stdlib WAV loader can read them.

  python -m preprocess.preprocess_librispeech --root ../librispeech \
      --subsets train-clean-100 test-clean

Conversion shells out to ffmpeg / sox / flac (whichever is installed).
"""

import argparse
import os
import shutil
import subprocess
import sys
import tarfile
import urllib.request

BASE_URL = 'https://www.openslr.org/resources/12/'
SUBSETS = ['train-clean-100', 'train-clean-360', 'train-other-500',
           'dev-clean', 'dev-other', 'test-clean', 'test-other']


def download(url, dest):
    if os.path.exists(dest):
        return dest
    print(f'downloading {url}')
    urllib.request.urlretrieve(url, dest + '.tmp')
    os.replace(dest + '.tmp', dest)
    return dest


def flac_to_wav(flac_path):
    wav_path = flac_path[:-5] + '.wav'
    if os.path.exists(wav_path):
        return True
    if shutil.which('ffmpeg'):
        cmd = ['ffmpeg', '-loglevel', 'quiet', '-y', '-i', flac_path,
               '-ar', '16000', '-ac', '1', wav_path]
    elif shutil.which('sox'):
        cmd = ['sox', flac_path, '-r', '16000', '-c', '1', wav_path]
    elif shutil.which('flac'):
        cmd = ['flac', '-s', '-d', '-o', wav_path, flac_path]
    else:
        # no shell decoder installed: the repo's own native FLAC decoder
        # (native/flac_decoder.cpp) does the conversion in-process
        try:
            from edgedict_tpu.data.audio_io import load_audio, save_wav
            audio, sr = load_audio(flac_path)
            save_wav(wav_path, audio, sr)
            return True
        except Exception:
            return False
    return subprocess.call(cmd) == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--subsets', nargs='+', default=['test-clean'],
                    choices=SUBSETS)
    ap.add_argument('--keep_flac', action='store_true')
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)

    for subset in args.subsets:
        tar_path = os.path.join(args.root, f'{subset}.tar.gz')
        download(BASE_URL + f'{subset}.tar.gz', tar_path)
        print(f'extracting {tar_path}')
        with tarfile.open(tar_path) as tf:
            tf.extractall(args.root)
        subset_dir = os.path.join(args.root, 'LibriSpeech', subset)
        n_ok = n_fail = 0
        for dirpath, _, files in os.walk(subset_dir):
            for fn in files:
                if fn.endswith('.flac'):
                    ok = flac_to_wav(os.path.join(dirpath, fn))
                    n_ok += ok
                    n_fail += not ok
                    if ok and not args.keep_flac:
                        os.remove(os.path.join(dirpath, fn))
        print(f'{subset}: converted {n_ok} files, {n_fail} failed')
        if n_fail:
            print('install ffmpeg/sox/flac for conversion', file=sys.stderr)


if __name__ == '__main__':
    main()
