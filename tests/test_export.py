"""AOT export: serialize → reload → parity with the live model, and the
exported stream decoder matches the jitted StreamingDecoder output."""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.export import ExportedStreamDecoder, export_transducer
from edgedict_tpu.features import FeatureConfig, FeaturePipeline
from edgedict_tpu.models import transducer as T
from edgedict_tpu.stream import StreamingDecoder

CFG = T.TransducerConfig(
    vocab_size=16, vocab_embed_size=8, input_size=9,
    enc_hidden_size=16, enc_layers=2, enc_proj_size=12,
    dec_hidden_size=16, dec_layers=1, dec_proj_size=12,
    joint_size=16, enc_time_reductions=())

FEAT = FeatureConfig(feature_type='logfbank', feature_size=3, n_fft=64,
                     win_length=40, hop_length=20, downsample=3,
                     pad_to_divisible=False)


class _Tok:
    unk_id = 3

    def id_to_token(self, i):
        return chr(ord('a') + int(i)) + '</w>'


def test_export_roundtrip_and_stream_parity(tmp_path):
    params = T.transducer_init(jax.random.PRNGKey(0), CFG)
    out = export_transducer(params, CFG, str(tmp_path / 'export'),
                            step_frames=2, check_parity=True)

    pipeline = FeaturePipeline(FEAT)
    exported = ExportedStreamDecoder(out, pipeline, _Tok())
    live = StreamingDecoder(params, CFG, FEAT, _Tok(), step_n_frame=2)

    audio = np.random.RandomState(0).randn(live.win_size * 4) \
        .astype(np.float32) * 0.3
    n = (len(audio) - live.win_size) // live.hop_size + 1
    live_text, exp_text = [], []
    for i in range(n):
        chunk = audio[i * live.hop_size:i * live.hop_size + live.win_size]
        live_text.append(live.decode(chunk))
        exp_text.append(exported.decode(chunk))
    assert ''.join(live_text) == ''.join(exp_text)
