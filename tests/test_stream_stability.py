"""Long-session streaming hygiene: hundreds of chunks with carried state
must stay finite and bounded (the failure mode the reference's periodic
resets paper over, youtube_live.py:125-128)."""

import numpy as np
import jax

from edgedict_tpu.features import FeatureConfig
from edgedict_tpu.models import transducer as T
from edgedict_tpu.stream import StreamingDecoder


class _Tok:
    unk_id = 3

    def id_to_token(self, i):
        return 'x'


def test_long_session_state_stays_bounded():
    feature_cfg = FeatureConfig(
        feature_type='logfbank', feature_size=4, n_fft=64, win_length=64,
        hop_length=32, downsample=2, pad_to_divisible=False)
    cfg = T.TransducerConfig(
        vocab_size=12, vocab_embed_size=8, input_size=8,
        enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
        dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
        joint_size=16, enc_time_reductions=())
    params = T.transducer_init(jax.random.PRNGKey(0), cfg)
    dec = StreamingDecoder(params, cfg, feature_cfg, _Tok(),
                           step_n_frame=2)
    rng = np.random.RandomState(0)
    for i in range(300):
        # alternating speech-like noise and silence
        if (i // 20) % 2 == 0:
            chunk = (0.2 * rng.randn(dec.win_size)).astype(np.float32)
        else:
            chunk = np.zeros(dec.win_size, np.float32)
        dec.decode(chunk)
        if i % 100 == 99:
            h = np.asarray(dec.state.enc_state[0])
            c = np.asarray(dec.state.enc_state[1])
            assert np.isfinite(h).all() and np.isfinite(c).all()
            # LSTM cell state stays bounded (gating keeps |c| in check)
            assert np.abs(c).max() < 50.0, np.abs(c).max()
