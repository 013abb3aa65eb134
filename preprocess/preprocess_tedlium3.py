"""TEDLIUM release-3 prep (reference preprocess/preprocess_tedlium3.py):
download/extract openslr resource 51, then cut the single data/ directory's
.sph talks into utterance wavs + labels.txt
(layout: TEDLIUM_release-3/data/).

  python -m preprocess.preprocess_tedlium3 --save_path data \
      [--download] [--extract] [--convert]
"""

import argparse
import os

from preprocess.preprocess_tedlium import convert_split, download_and_extract

URL = 'http://www.openslr.org/resources/51/TEDLIUM_release-3.tgz'
NAME = 'TEDLIUM_release-3.tgz'


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
        convert_split(
            os.path.join(args.save_path, 'TEDLIUM_release-3', 'data'))


if __name__ == '__main__':
    main()
