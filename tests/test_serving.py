"""TCP serving frontend (edgedict_tpu/serving.py) over loopback.

Streams are independent on the server-mode batch axis, so each client's
concatenated deltas must equal the single-stream StreamingDecoder's text
for the same audio (that cross-engine equality is itself pinned by
tests/test_stream.py's multistream cases)."""

import asyncio
import socket
import struct
import threading

import numpy as np
import pytest

import jax

from edgedict_tpu.features import FeatureConfig
from edgedict_tpu.models import transducer as T
from edgedict_tpu.serving import StreamServer, stream_client
from edgedict_tpu.stream import MultiStreamDecoder, StreamingDecoder

CFG = T.TransducerConfig(
    vocab_size=32, vocab_embed_size=8, input_size=9,
    enc_hidden_size=16, enc_layers=1, enc_proj_size=16,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=16,
    joint_size=16, enc_time_reductions=())

FEAT = FeatureConfig(
    feature_type='logfbank', feature_size=3, n_fft=64, win_length=40,
    hop_length=20, downsample=3, pad_to_divisible=False)


class _Tok:
    unk_id = 3

    def id_to_token(self, i):
        return chr(ord('a') + i % 26) + '</w>'


def _params():
    params = T.transducer_init(jax.random.PRNGKey(0), CFG)
    # push the blank column down so random audio decodes nonempty text
    params['joint']['out']['b'] = \
        params['joint']['out']['b'].at[int(CFG.blank)].add(-2.0)
    return params


def _audio(seed, n=1600):
    return (np.random.RandomState(seed).randn(n) * 0.3).astype(np.float32)


def _offline_text(params, audio):
    dec = StreamingDecoder(params, CFG, FEAT, _Tok(), step_n_frame=2)
    return dec.decode_wav(audio)


class _ServerThread:
    """Run the asyncio server on a background thread; expose host/port."""

    def __init__(self, n_streams=None, round_timeout=None, decoder=None,
                 **server_kw):
        dec = decoder if decoder is not None else MultiStreamDecoder(
            _params(), CFG, FEAT, _Tok(), n_streams=n_streams,
            step_n_frame=2)
        self.server = StreamServer(dec, round_timeout=round_timeout,
                                   **server_kw)
        self._loop = None
        started = threading.Event()

        def run():
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)
            self._loop.run_until_complete(self.server.start())
            started.set()
            self._loop.run_forever()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        assert started.wait(60)

    @property
    def addr(self):
        return self.server.host, self.server.port

    def stop(self):
        asyncio.run_coroutine_threadsafe(
            self.server.stop(), self._loop).result(60)
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(30)


def test_single_client_matches_offline():
    srv = _ServerThread(n_streams=2)
    try:
        audio = _audio(0)
        want = _offline_text(_params(), audio)
        got = stream_client(*srv.addr, audio, chunk_samples=500)
        assert got == want and want
    finally:
        srv.stop()


def test_concurrent_clients_each_match_offline():
    srv = _ServerThread(n_streams=3)
    try:
        audios = [_audio(1), _audio(2)]
        wants = [_offline_text(_params(), a) for a in audios]
        gots = [None, None]

        def run(i):
            gots[i] = stream_client(*srv.addr, audios[i], chunk_samples=300)

        threads = [threading.Thread(target=run, args=(i,)) for i in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert gots == wants
        assert srv.server.rounds >= 13     # 13 windows per stream
    finally:
        srv.stop()


def test_busy_rejection_and_slot_reuse():
    srv = _ServerThread(n_streams=1)
    try:
        host, port = srv.addr
        # hold the only slot open (no end-of-stream yet)
        hold = socket.create_connection((host, port))
        piece = _audio(3, 200).tobytes()
        hold.sendall(struct.pack('<I', len(piece)) + piece)
        # second client is rejected
        assert stream_client(host, port, _audio(4)) == '[busy]'
        # release the slot
        hold.sendall(struct.pack('<I', 0))
        from edgedict_tpu.serving import _drain_text
        _drain_text(hold)
        hold.close()
        # the freed slot serves a fresh client with RESET state: text
        # equals the offline decode of only ITS audio
        audio = _audio(5)
        assert stream_client(host, port, audio) == \
            _offline_text(_params(), audio)
    finally:
        srv.stop()


def test_beam_serving_replaces_hypothesis():
    """Beam server mode ('=' replace messages): the client's final
    transcript equals a direct lockstep drive of MultiStreamBeamDecoder
    on the same windows."""
    from edgedict_tpu.stream import MultiStreamBeamDecoder

    params = _params()
    audio = _audio(7)

    def beam_dec():
        return MultiStreamBeamDecoder(params, CFG, FEAT, _Tok(),
                                      n_streams=2, step_n_frame=2,
                                      beam_width=3)

    direct = beam_dec()
    win, hop = direct.win_size, direct.hop_size
    final = ''
    for j in range((len(audio) - win) // hop + 1):
        frames = np.zeros((2, win), np.float32)
        frames[0] = audio[j * hop:j * hop + win]
        final = direct.decode(frames)[0]

    srv = _ServerThread(decoder=beam_dec(), full_hypothesis=True)
    try:
        got = stream_client(*srv.addr, audio, chunk_samples=400)
        assert got == final and final
    finally:
        srv.stop()


def test_slot_state_is_fresh_after_idle_rounds():
    """A freed slot keeps hearing silence while other streams drive
    rounds; the NEXT client on that slot must still get exactly its own
    transcript (reset happens at attach)."""
    srv = _ServerThread(n_streams=2)
    try:
        host, port = srv.addr
        a, b = _audio(8), _audio(9)
        # client 1 occupies slot 0, finishes; slot 0 then idles while
        # client 2 (slot 1) drives many rounds
        assert stream_client(host, port, a) == _offline_text(_params(), a)
        assert stream_client(host, port, b) == _offline_text(_params(), b)
        # now a fresh client re-attaches to slot 0 after it sat through
        # the previous client's rounds as silence
        c = _audio(10)
        assert stream_client(host, port, c) == _offline_text(_params(), c)
    finally:
        srv.stop()


def test_malformed_payload_frees_slot():
    """A payload that isn't float32-aligned is a protocol error: the slot
    must flush and free (not leak attached forever), and the next client
    decodes normally."""
    from edgedict_tpu.serving import _drain_text

    srv = _ServerThread(n_streams=1)
    try:
        host, port = srv.addr
        bad = socket.create_connection((host, port))
        bad.sendall(struct.pack('<I', 3) + b'abc')
        assert _drain_text(bad) == ''          # flushed, nothing decoded
        bad.close()
        audio = _audio(11)
        assert stream_client(host, port, audio) == \
            _offline_text(_params(), audio)
    finally:
        srv.stop()


def test_timed_round_feeds_silence_for_late_stream():
    """round_timeout mode: a ready stream is not held hostage by an
    attached-but-silent one."""
    srv = _ServerThread(n_streams=2, round_timeout=0.1)
    try:
        host, port = srv.addr
        # attach a stream that never sends audio
        idle = socket.create_connection((host, port))
        audio = _audio(6)
        got = stream_client(host, port, audio, chunk_samples=400)
        # the active client still decodes (its windows were consumed in
        # timed rounds); the idle stream heard silence — no crash, and
        # the active transcript equals the offline decode
        assert got == _offline_text(_params(), audio)
        idle.sendall(struct.pack('<I', 0))
        idle.close()
    finally:
        srv.stop()


def test_int16_server_with_beam_decoder_matches_float():
    """cli.serve --beam_width N --pcm_int16 end-to-end: an int16-mode
    server running a MultiStreamBeamDecoder must transcribe 16-bit-PCM
    audio identically to a float32 beam server (regression: the beam
    decoder once skipped the 1/32768 scaling for int16 frames)."""
    from edgedict_tpu.stream import MultiStreamBeamDecoder
    params = _params()
    q = (np.random.RandomState(9).randn(1600) * 8000).astype(np.int16)
    f = q.astype(np.float32) / 32768.0

    def beam_dec():
        return MultiStreamBeamDecoder(params, CFG, FEAT, _Tok(),
                                      n_streams=2, step_n_frame=2,
                                      beam_width=2)

    srv = _ServerThread(decoder=beam_dec(), pcm='int16',
                        full_hypothesis=True)
    try:
        got_i16 = stream_client(*srv.addr, q, chunk_samples=500,
                                int16=True)
    finally:
        srv.stop()
    srv = _ServerThread(decoder=beam_dec(), full_hypothesis=True)
    try:
        got_f32 = stream_client(*srv.addr, f, chunk_samples=500)
    finally:
        srv.stop()
    assert got_i16 == got_f32 and got_f32  # nonempty, identical


def test_int16_wire_and_server_match_float():
    """int16 PCM protocol (length-prefix top bit): an int16-mode server
    fed by int16 clients produces the same transcript as the float32
    server for audio sourced from 16-bit PCM (exact round-trip); mixed
    float clients on an int16 server are quantized at ingest and still
    match."""
    q = (np.random.RandomState(9).randn(1600) * 8000).astype(np.int16)
    f = q.astype(np.float32) / 32768.0
    want = _offline_text(_params(), f)
    srv = _ServerThread(n_streams=2, pcm='int16')
    try:
        host, port = srv.addr
        assert stream_client(host, port, q, chunk_samples=500,
                             int16=True) == want
        # float client on the int16 server: quantized at ingest, exact
        # here because the source is 16-bit PCM
        assert stream_client(host, port, f, chunk_samples=500) == want
    finally:
        srv.stop()
    srv = _ServerThread(n_streams=2)
    try:
        # int16 client on a float32 server: scaled back to float
        assert stream_client(*srv.addr, q, chunk_samples=500,
                             int16=True) == want
    finally:
        srv.stop()
