"""TEDLIUM release-1 prep (reference preprocess/preprocess_tedlium1.py):
download/extract openslr resource 7, then cut each split's .sph talks into
utterance wavs + labels.txt (layout: TEDLIUM_release1/{train,test}/).

  python -m preprocess.preprocess_tedlium1 --save_path data \
      [--download] [--extract] [--convert]
"""

import argparse
import os

from preprocess.preprocess_tedlium import convert_split, download_and_extract

URL = 'http://www.openslr.org/resources/7/TEDLIUM_release1.tar.gz'
NAME = 'TEDLIUM_release1.tar.gz'
SPLITS = ('train', 'test')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--save_path', type=str, default='data')
    ap.add_argument('--download', action='store_true')
    ap.add_argument('--extract', action='store_true')
    ap.add_argument('--convert', action='store_true')
    args = ap.parse_args()
    if not os.path.exists(args.save_path):
        raise ValueError('Target directory does not exist.')
    download_and_extract(args.save_path, URL, NAME,
                         args.download, args.extract)
    if args.convert:
        for split in SPLITS:
            convert_split(
                os.path.join(args.save_path, 'TEDLIUM_release1', split))


if __name__ == '__main__':
    main()
