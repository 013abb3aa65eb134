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


def test_export_int8_artifact_parity_and_size(tmp_path):
    """quantize='int8' export: parity asserts pass against the live
    quantized model, the reloaded decoder matches the live int8
    StreamingDecoder token-for-token, and the encoder artifact carries
    int8 weight constants (materially smaller than the fp32 export).
    Uses a 128-wide encoder so the weights dominate the artifact."""
    import dataclasses
    import json
    import os

    cfg = dataclasses.replace(CFG, enc_hidden_size=128, enc_proj_size=128)
    params = T.transducer_init(jax.random.PRNGKey(1), cfg)
    out32 = export_transducer(params, cfg, str(tmp_path / 'e32'),
                              step_frames=2, check_parity=True)
    out8 = export_transducer(params, cfg, str(tmp_path / 'e8'),
                             step_frames=2, check_parity=True,
                             quantize='int8')
    s32 = os.path.getsize(os.path.join(out32, 'encoder.stablehlo'))
    s8 = os.path.getsize(os.path.join(out8, 'encoder.stablehlo'))
    assert s8 < 0.55 * s32, (s8, s32)
    assert json.load(open(os.path.join(out8, 'meta.json')))['quantize'] \
        == 'int8'

    pipeline = FeaturePipeline(FEAT)
    exported = ExportedStreamDecoder(out8, pipeline, _Tok())
    live = StreamingDecoder(params, cfg, FEAT, _Tok(), step_n_frame=2,
                            quantize='int8')
    audio = np.random.RandomState(1).randn(live.win_size * 4) \
        .astype(np.float32) * 0.3
    n = (len(audio) - live.win_size) // live.hop_size + 1
    live_text, exp_text = [], []
    for i in range(n):
        chunk = audio[i * live.hop_size:i * live.hop_size + live.win_size]
        live_text.append(live.decode(chunk))
        exp_text.append(exported.decode(chunk))
    assert ''.join(live_text) == ''.join(exp_text)
