"""The preprocess/ corpus-prep scripts executed on tiny synthetic corpora
(reference preprocess/preprocess_{tedlium3,common_voice,libri_speech}.py):
stm parsing + segmentation math, the labels.txt layout the TEDLIUM adapter
consumes, the release-1 directory walk, the Common Voice clip scan, and
flac→wav conversion via the in-process native decoder."""

import os
import sys
import tarfile

import numpy as np
import pytest

REF_FLAC = '/root/reference/3729-6852-0035.flac'


def _write_talk(sph_dir, stm_dir, talk, utts, sr=16000, total=4.0):
    """One synthetic talk: a wav 'recording' + its .stm segmentation.
    Each utt is (start, end, raw_stm_text)."""
    from edgedict_tpu.data.audio_io import save_wav
    os.makedirs(sph_dir, exist_ok=True)
    os.makedirs(stm_dir, exist_ok=True)
    t = np.linspace(0, total, int(sr * total), endpoint=False)
    save_wav(os.path.join(sph_dir, talk + '.wav'),
             0.3 * np.sin(2 * np.pi * 300 * t), sr)
    lines = []
    for start, end, text in utts:
        lines.append(f'{talk} 1 {talk} {start:.2f} {end:.2f} '
                     f'<o,f0,male> {text}')
    with open(os.path.join(stm_dir, talk + '.stm'), 'w') as f:
        f.write('\n'.join(lines) + '\n')


def test_parse_stm_text_cleanup(tmp_path):
    """Pause markers, {NOTATION} blocks, <sil>, apostrophe spacing and
    ignore_time_segment lines are handled like the reference
    (preprocess_tedlium3.py PAUSE_MATCH/NOTATION)."""
    from preprocess.preprocess_tedlium import parse_stm
    stm = tmp_path / 'x.stm'
    stm.write_text(
        "x 1 x 0.0 1.0 <o> it (2) wasn 't {COUGH} here <sil>\n"
        "x 1 x 1.0 2.0 <o> ignore_time_segment_in_scoring\n"
        "x 1 x 2.0 3.0 <o> plain text\n"
        "short line\n")
    utts = parse_stm(str(stm))
    assert len(utts) == 2
    start, end, text = utts[0]
    assert (start, end) == (0.0, 1.0)
    assert '(2)' not in text and '{COUGH}' not in text
    assert "wasn't" in text
    assert utts[1] == (2.0, 3.0, 'plain text')


def test_tedlium_convert_split_and_adapter_roundtrip(tmp_path):
    """convert_split cuts the talk by the stm segments and writes
    wav/labels.txt; the TEDLIUM dataset adapter then loads the result —
    the full prep→train-input path on a synthetic corpus."""
    from edgedict_tpu.data.audio_io import load_audio
    from edgedict_tpu.data.dataset import TEDLIUM
    from preprocess.preprocess_tedlium import convert_split

    root = str(tmp_path / 'train')
    _write_talk(os.path.join(root, 'sph'), os.path.join(root, 'stm'),
                'TalkA', [(0.5, 1.5, 'hello world'),
                          (2.0, 3.5, 'second utterance')])
    n = convert_split(root)
    assert n == 2
    labels = open(os.path.join(root, 'wav', 'labels.txt')).read()
    assert 'TalkA-0000.wav hello world' in labels
    audio, sr = load_audio(os.path.join(root, 'wav', 'TalkA-0000.wav'))
    assert sr == 16000
    assert len(audio) == 16000          # 1.0 s cut [0.5, 1.5)
    audio1, _ = load_audio(os.path.join(root, 'wav', 'TalkA-0001.wav'))
    assert len(audio1) == 24000         # 1.5 s cut [2.0, 3.5)

    class Tok:
        def encode(self, text):
            return [1]

    ds = TEDLIUM(root, Tok(), audio_max_length=999)
    assert len(ds) == 2
    assert ds.data[0]['text'] == 'hello world'


def test_tedlium1_entry_point(tmp_path, monkeypatch):
    """The release-1 entry point walks {train,test}/{sph,stm} and converts
    both splits (preprocess_tedlium1.py layout)."""
    from preprocess import preprocess_tedlium1
    save = tmp_path / 'data'
    rel = save / 'TEDLIUM_release1'
    for split in ('train', 'test'):
        _write_talk(str(rel / split / 'sph'), str(rel / split / 'stm'),
                    f'T{split}', [(0.0, 1.0, f'{split} words')])
    monkeypatch.setattr(sys, 'argv', ['prog', '--save_path', str(save),
                                      '--convert'])
    preprocess_tedlium1.main()
    for split in ('train', 'test'):
        labels = (rel / split / 'wav' / 'labels.txt').read_text()
        assert f'{split} words' in labels


def test_download_and_extract_local_tar(tmp_path):
    """The extract stage unpacks a (local) archive in place — exercised on
    a tiny tarball instead of the 20 GB openslr download."""
    from preprocess.preprocess_tedlium import download_and_extract
    src = tmp_path / 'payload'
    src.mkdir()
    (src / 'inner.txt').write_text('ok')
    tar = tmp_path / 'TEDLIUM_release1.tar.gz'
    with tarfile.open(tar, 'w:gz') as tf:
        tf.add(src, arcname='TEDLIUM_release1')
    download_and_extract(str(tmp_path), 'http://unused', tar.name,
                         download=False, extract=True)
    assert (tmp_path / 'TEDLIUM_release1' / 'inner.txt').read_text() == 'ok'


def test_common_voice_scan_and_parallel_convert(tmp_path, monkeypatch):
    """preprocess_common_voice.main scans clips/*.mp3 and converts them in
    a thread pool; the ffmpeg call is faked (no ffmpeg in the image) so
    the scan/dispatch logic itself executes."""
    from preprocess import preprocess_common_voice
    clips = tmp_path / 'clips'
    clips.mkdir()
    for i in range(3):
        (clips / f'c{i}.mp3').write_bytes(b'\x00')
    (clips / 'not_audio.txt').write_text('skip me')
    converted = []

    def fake_convert(path):
        converted.append(os.path.basename(path))
        return True

    monkeypatch.setattr(preprocess_common_voice, 'convert', fake_convert)
    monkeypatch.setattr(sys, 'argv', ['prog', '--root', str(tmp_path),
                                      '--workers', '2'])
    preprocess_common_voice.main()
    assert sorted(converted) == ['c0.mp3', 'c1.mp3', 'c2.mp3']


def test_common_voice_convert_without_ffmpeg_fails_cleanly(tmp_path):
    from preprocess.preprocess_common_voice import convert
    mp3 = tmp_path / 'x.mp3'
    mp3.write_bytes(b'\x00')
    # rc != 0 (ffmpeg absent or the byte isn't an mp3): reported, no raise
    assert convert(str(mp3)) in (True, False)


@pytest.mark.skipif(not os.path.exists(REF_FLAC),
                    reason='bundled reference flac not present')
def test_librispeech_flac_to_wav_native_fallback(tmp_path):
    """flac→wav conversion without ffmpeg/sox/flac installed: the repo's
    native FLAC decoder converts in-process and the wav round-trips."""
    import shutil

    from edgedict_tpu.data.audio_io import load_audio
    from preprocess.preprocess_librispeech import flac_to_wav

    flac = str(tmp_path / 'u.flac')
    shutil.copyfile(REF_FLAC, flac)
    assert flac_to_wav(flac)
    wav = str(tmp_path / 'u.wav')
    assert os.path.exists(wav)
    a_wav, sr = load_audio(wav)
    a_flac, sr2 = load_audio(flac)
    assert sr == sr2 == 16000
    np.testing.assert_allclose(a_wav, a_flac, atol=1.0 / 32767)
