"""TEDLIUM prep (reference preprocess/preprocess_tedlium{1,3}.py): cut each
talk's .sph audio into utterance wavs using the .stm segmentation and write
wav/labels.txt in the layout the TEDLIUM dataset adapter expects
(<root>/wav/<utt>.wav + <root>/wav/labels.txt).

  python -m preprocess.preprocess_tedlium --root .../TEDLIUM_release1/train

Release-specific entry points (directory layout + download/extract stages):
preprocess_tedlium1.py (release 1: <root>/{train,test}/{sph,stm}) and
preprocess_tedlium3.py (release 3: <root>/data/{sph,stm}).
"""

import argparse
import os
import re
import subprocess

# reference text cleanup (preprocess_tedlium3.py PAUSE_MATCH/NOTATION):
# drop pause/hesitation markers and inline (notations)
PAUSE_MATCH = re.compile(r'\([0-9]+\)')
NOTATION = re.compile(r'\{[A-Z ]+\}')


def parse_stm(path):
    """Yield (start, end, text) utterances from one .stm file."""
    utts = []
    with open(path, errors='ignore') as f:
        for line in f:
            parts = line.split(None, 6)
            if len(parts) < 7 or 'ignore_time_segment' in parts[6]:
                continue
            start, end, text = float(parts[3]), float(parts[4]), parts[6]
            text = text.replace('<sil>', '')
            text = PAUSE_MATCH.sub('', text)
            text = NOTATION.sub('', text)
            text = text.replace(" '", "'").strip()
            if text:
                utts.append((start, end, text))
    return utts


def cut(sph_path, start, end, wav_path):
    """Cut [start, end) seconds of one talk into a 16 kHz mono wav.  .sph
    sources go through ffmpeg; when the source is already wav/flac (or
    ffmpeg is absent) the repo's own loaders slice it in-process."""
    import shutil
    ext = os.path.splitext(sph_path)[1].lower()
    if ext == '.sph' and shutil.which('ffmpeg'):
        return subprocess.call(
            ['ffmpeg', '-loglevel', 'quiet', '-y', '-i', sph_path,
             '-ss', f'{start:.2f}', '-to', f'{end:.2f}',
             '-ar', '16000', '-ac', '1', wav_path]) == 0
    if ext in ('.wav', '.flac'):
        try:
            from edgedict_tpu.data.audio_io import load_audio, save_wav
            audio, sr = load_audio(sph_path)
            lo, hi = int(start * sr), min(int(end * sr), len(audio))
            if hi <= lo:
                return False
            save_wav(wav_path, audio[lo:hi], sr)
            return True
        except Exception:
            return False
    return False


def convert_split(root):
    """Cut one split dir (containing sph/ + stm/) into wav/ + labels.txt.
    Returns the number of utterances written."""
    sph_dir = os.path.join(root, 'sph')
    stm_dir = os.path.join(root, 'stm')
    out_dir = os.path.join(root, 'wav')
    os.makedirs(out_dir, exist_ok=True)

    labels = []
    for stm in sorted(os.listdir(stm_dir)):
        if not stm.endswith('.stm'):
            continue
        talk = stm[:-4]
        for ext in ('.sph', '.wav', '.flac'):
            sph = os.path.join(sph_dir, talk + ext)
            if os.path.exists(sph):
                break
        else:
            continue
        for i, (start, end, text) in enumerate(
                parse_stm(os.path.join(stm_dir, stm))):
            name = f'{talk}-{i:04d}.wav'
            if cut(sph, start, end, os.path.join(out_dir, name)):
                labels.append(f'{name} {text}')
    with open(os.path.join(out_dir, 'labels.txt'), 'w') as f:
        f.write('\n'.join(labels) + '\n')
    print(f'wrote {len(labels)} utterances to {out_dir}')
    return len(labels)


def download_and_extract(save_path, url, name, download, extract):
    """Reference download/extract stages (preprocess_tedlium3.py:40-70) —
    wget-equivalent fetch + tar extraction, both opt-in flags."""
    archive = os.path.join(save_path, name)
    if download:
        import urllib.request
        print(f'downloading {url}')
        urllib.request.urlretrieve(url, archive)
    if extract:
        import tarfile
        print(f'extracting {archive}')
        with tarfile.open(archive) as tf:
            tf.extractall(save_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True,
                    help='TEDLIUM release split dir containing sph/ + stm/')
    args = ap.parse_args()
    convert_split(args.root)


if __name__ == '__main__':
    main()
