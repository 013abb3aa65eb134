"""Ahead-of-time export of the encoder / predictor / joint triplet.

Replaces the reference's ONNX → OpenVINO pipeline (cli/export_onnx.py:18-222,
export_openvino.sh): instead of .onnx/.xml graphs consumed by an external
inference engine, each component is traced at the pinned streaming shapes
(the export_openvino.sh static-shape table) and serialized with
`jax.export` — a portable StableHLO artifact with the weights embedded,
reloadable without the Python model code.

Numerical parity against the live model is asserted at export time with the
reference's tolerances (rtol 1e-3, atol 1e-5 — cli/export_onnx.py:63-68).

`ExportedStreamDecoder` mirrors OpenVINOStreamDecoder's role
(rnnt/stream.py:123-223): the same streaming protocol, but backed by the
serialized artifacts.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.models import transducer as T

PARITY_RTOL = 1e-3
PARITY_ATOL = 1e-5


def _export_one(fn, args, path):
    exp = jax.export.export(jax.jit(fn))(
        *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args])
    with open(path, 'wb') as f:
        f.write(exp.serialize())
    return exp


def export_transducer(params, cfg: T.TransducerConfig, out_dir,
                      batch_size=1, step_frames=2, check_parity=True,
                      quantize=None):
    """Serialize encoder/decoder/joint at pinned shapes → out_dir.

    Shapes follow the reference export table (export_openvino.sh:31-50):
    encoder consumes `step_frames` stacked feature frames with explicit
    (h, c) state I/O; decoder one token with state; joint one (enc, dec)
    feature pair.

    quantize='int8': the encoder is weight-only-quantized BEFORE tracing
    (ops/quant.py via stream.prepare_inference_params), so the artifact
    carries int8 weight constants + per-channel scales — roughly half
    the encoder artifact bytes — and dequantizes at execution; parity is
    asserted against the live quantized model (the OpenVINO
    post-training-int8 artifact role).
    """
    os.makedirs(out_dir, exist_ok=True)
    B = batch_size
    params = jax.tree.map(jnp.asarray, params)
    if quantize is not None:
        from edgedict_tpu.stream import prepare_inference_params
        params = prepare_inference_params(params, None, quantize=quantize)

    def encoder_fn(xs, h, c):
        ys, (h2, c2) = T.encoder_apply(params['encoder'], cfg, xs, (h, c))
        return ys, h2, c2

    def decoder_fn(token, h, c):
        ys, (h2, c2) = T.decoder_apply(params['decoder'], cfg, token,
                                       (h, c))
        return ys, h2, c2

    def joint_fn(f, g):
        return T.joint_apply(params['joint'], f, g)

    enc_args = (
        jnp.zeros((B, step_frames, cfg.input_size), jnp.float32),
        jnp.zeros((cfg.enc_layers, B, cfg.enc_hidden_size), jnp.float32),
        jnp.zeros((cfg.enc_layers, B, cfg.enc_hidden_size), jnp.float32))
    dec_args = (
        jnp.zeros((B, 1), jnp.int32),
        jnp.zeros((cfg.dec_layers, B, cfg.dec_hidden_size), jnp.float32),
        jnp.zeros((cfg.dec_layers, B, cfg.dec_hidden_size), jnp.float32))
    joint_args = (
        jnp.zeros((B, cfg.enc_proj_size), jnp.float32),
        jnp.zeros((B, cfg.dec_proj_size), jnp.float32))

    specs = {'encoder': (encoder_fn, enc_args),
             'decoder': (decoder_fn, dec_args),
             'joint': (joint_fn, joint_args)}
    for name, (fn, args) in specs.items():
        exp = _export_one(fn, args, os.path.join(out_dir,
                                                 f'{name}.stablehlo'))
        if check_parity:
            rng = np.random.RandomState(0)
            live_args = tuple(
                jnp.asarray(rng.randn(*a.shape), a.dtype)
                if a.dtype != jnp.int32 else
                jnp.asarray(rng.randint(4, cfg.vocab_size, a.shape),
                            jnp.int32)
                for a in args)
            want = fn(*live_args)
            got = exp.call(*live_args)
            jax.tree.map(
                lambda w, g: np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=PARITY_RTOL,
                    atol=PARITY_ATOL), want, got)

    meta = {
        'batch_size': B, 'step_frames': step_frames,
        'quantize': quantize,
        'config': {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in cfg.__dict__.items()},
    }
    with open(os.path.join(out_dir, 'meta.json'), 'w') as f:
        json.dump(meta, f, indent=2)
    return out_dir


def build_exported_decoder(FLAGS, export_dir=None):
    """ExportedStreamDecoder from the flag/logdir contract, with the chunk
    geometry attached (win_size/hop_size) — shared by cli.demo,
    cli.youtube_live --wav and cli.wav_inference (flag-free module so CLI
    cross-imports don't collide absl flag registrations)."""
    from edgedict_tpu.features import FeatureConfig, FeaturePipeline
    from edgedict_tpu.stream import stream_chunk_geometry
    from edgedict_tpu.trainer import build_tokenizer

    tokenizer = build_tokenizer(FLAGS)
    feature_cfg = FeatureConfig.from_flags(FLAGS, pad_to_divisible=False)
    pipeline = FeaturePipeline(feature_cfg)
    export_dir = export_dir or os.path.join(FLAGS.logdir_root, FLAGS.name,
                                            'export')
    decoder = ExportedStreamDecoder(export_dir, pipeline, tokenizer)
    decoder.win_size, decoder.hop_size = stream_chunk_geometry(
        FLAGS.win_length, FLAGS.hop_length, FLAGS.downsample,
        decoder.meta['step_frames'])
    return decoder


class ExportedStreamDecoder:
    """Streaming decoder over serialized artifacts (the
    OpenVINOStreamDecoder role, rnnt/stream.py:123-223): same decode(frame)
    protocol as StreamingDecoder, no model code or params needed."""

    def __init__(self, artifact_dir, feature_pipeline, tokenizer,
                 blank=0):
        with open(os.path.join(artifact_dir, 'meta.json')) as f:
            self.meta = json.load(f)
        cfg = self.meta['config']
        self.enc_layers = cfg['enc_layers']
        self.enc_hidden = cfg['enc_hidden_size']
        self.dec_layers = cfg['dec_layers']
        self.dec_hidden = cfg['dec_hidden_size']
        self.blank = blank
        self.tokenizer = tokenizer
        self.pipeline = feature_pipeline

        def load(name):
            with open(os.path.join(artifact_dir,
                                   f'{name}.stablehlo'), 'rb') as f:
                return jax.export.deserialize(f.read())
        self.encoder = load('encoder')
        self.decoder = load('decoder')
        self.joint = load('joint')
        self.reset_profile()
        self.reset()

    def reset_profile(self):
        """Per-chunk wall times, the reference reset_profile protocol
        (rnnt/stream.py:16-26) — consumed by cli.wav_inference."""
        self.elapsed = []

    def reset(self):
        b = self.meta['batch_size']
        self.enc_h = jnp.zeros((self.enc_layers, b, self.enc_hidden))
        self.enc_c = jnp.zeros_like(self.enc_h)
        dec_h = jnp.zeros((self.dec_layers, b, self.dec_hidden))
        dec_c = jnp.zeros_like(dec_h)
        from edgedict_tpu.tokenizer import BOS
        bos = jnp.full((b, 1), BOS, jnp.int32)
        self.dec_x, self.dec_h, self.dec_c = self.decoder.call(
            bos, dec_h, dec_c)

    def decode(self, frame: np.ndarray) -> str:
        """frame: (win_size,) samples → newly decoded text (greedy, one
        token max per encoder frame, like rnnt/stream.py:93-120)."""
        start = time.time()
        audio = jnp.asarray(frame, jnp.float32)[None, :]
        xs, _ = self.pipeline(audio, jnp.asarray([audio.shape[1]]))
        enc_xs, self.enc_h, self.enc_c = self.encoder.call(
            xs.astype(jnp.float32), self.enc_h, self.enc_c)
        out = []
        from edgedict_tpu.tokenizer import UNK
        for k in range(enc_xs.shape[1]):
            logits = np.asarray(self.joint.call(enc_xs[:, k],
                                                self.dec_x[:, 0]))[0]
            pred = int(logits.argmax())
            if pred == UNK:
                logits[pred] = -np.inf
                pred = int(logits.argmax())
            if pred != self.blank:
                self.dec_x, self.dec_h, self.dec_c = self.decoder.call(
                    jnp.full((1, 1), pred, jnp.int32),
                    self.dec_h, self.dec_c)
                if pred > UNK:
                    out.append(self.tokenizer.id_to_token(pred)
                               .replace('</w>', ' '))
        self.elapsed.append(time.time() - start)
        return ''.join(out)
