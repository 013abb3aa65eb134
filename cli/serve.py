"""Serving CLI: N concurrent PCM streams over TCP, one device dispatch
per chunk round (server mode, edgedict_tpu/serving.py).

  python -m cli.serve --flagfile logs/<name>/flagfile.txt \
      --port 8765 --n_streams 64

No reference counterpart (the reference decoders are single-stream,
/root/reference/stream.py:71-134): this is the production deployment
front end for MultiStreamDecoder.  Clients speak the length-prefixed
float32-PCM protocol documented in edgedict_tpu/serving.py; a minimal
client is `edgedict_tpu.serving.stream_client`, e.g.

  from edgedict_tpu.data import load_audio
  from edgedict_tpu.serving import stream_client
  audio, _ = load_audio('x.wav')
  print(stream_client('127.0.0.1', 8765, audio))

--serve_dp_size > 1 shards the stream axis over a 'dp' mesh
(multi-chip serving scale-out; n_streams must divide by it).
--beam_width W (from cli.stream's registry) switches every slot to
server-mode beam search: rounds send '=' replace messages carrying the
stream's current best hypothesis instead of '+' append deltas.
"""

from absl import app, flags

from cli.stream import load_inference_bundle
from edgedict_tpu.config import FLAGS

# step_n_frame / model_name / infer_dtype / beam flags come from the
# cli.stream import above (shared registry)
flags.DEFINE_string('serve_host', '127.0.0.1', 'listen address')
flags.DEFINE_integer('port', 8765, 'listen port (0 = ephemeral)')
flags.DEFINE_integer('n_streams', 64, 'concurrent stream slots (the '
                     'batch axis of the server-mode chunk step)')
flags.DEFINE_integer('round_timeout_ms', 75,
                     'dispatch a partial round after this long with at '
                     'least one ready stream (late streams hear silence '
                     'for the round); 0 = lockstep, wait for every '
                     'attached stream')
flags.DEFINE_integer('serve_dp_size', 0,
                     '>1: shard the stream axis over a dp mesh of this '
                     'many devices')
flags.DEFINE_bool('pcm_int16', False,
                  'keep PCM int16 from the wire through the round buffers '
                  'and the host->device copy (the device scales in-step); '
                  'clients flag int16 payloads via the length prefix top '
                  'bit, float32 payloads are quantized at ingest')


def build_server(FLAGS):
    from edgedict_tpu.serving import StreamServer
    from edgedict_tpu.stream import MultiStreamBeamDecoder, MultiStreamDecoder

    params, cfg, feature_cfg, tokenizer, compute_dtype, quantize = \
        load_inference_bundle(FLAGS)
    mesh = None
    if FLAGS.serve_dp_size > 1:
        import jax
        from jax.sharding import Mesh
        import numpy as np
        n_dev = len(jax.devices())
        assert n_dev >= FLAGS.serve_dp_size, (
            f'--serve_dp_size {FLAGS.serve_dp_size} but only {n_dev} '
            'devices — a silently smaller mesh would miss real-time '
            'deadlines at the planned stream count')
        mesh = Mesh(np.array(jax.devices()[:FLAGS.serve_dp_size]), ('dp',))
    beam = getattr(FLAGS, 'beam_width', 1) > 1
    if beam:
        # beam serving: each round replaces the client's transcript with
        # the stream's current best hypothesis ('=' messages); --lm_path
        # adds shallow fusion
        from cli.stream import load_lm_fusion
        dec = MultiStreamBeamDecoder(
            params, cfg, feature_cfg, tokenizer,
            n_streams=FLAGS.n_streams, step_n_frame=FLAGS.step_n_frame,
            beam_width=FLAGS.beam_width,
            max_sym_per_frame=getattr(FLAGS, 'max_sym_per_frame', 3),
            merge_prefixes=getattr(FLAGS, 'merge_prefixes', True),
            lm=load_lm_fusion(FLAGS),
            mesh=mesh, compute_dtype=compute_dtype, quantize=quantize)
    else:
        dec = MultiStreamDecoder(
            params, cfg, feature_cfg, tokenizer,
            n_streams=FLAGS.n_streams, step_n_frame=FLAGS.step_n_frame,
            mesh=mesh, compute_dtype=compute_dtype, quantize=quantize)
    timeout = (FLAGS.round_timeout_ms / 1e3
               if FLAGS.round_timeout_ms > 0 else None)
    return StreamServer(dec, host=FLAGS.serve_host, port=FLAGS.port,
                        round_timeout=timeout, full_hypothesis=beam,
                        pcm='int16' if FLAGS.pcm_int16 else 'float32')


def main(argv):
    del argv
    import asyncio

    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    server = build_server(FLAGS)

    async def run():
        await server.start()
        print(f'serving {server.dec.n} stream slots on '
              f'{server.host}:{server.port} '
              f'(chunk {server.dec.hop_size / 16000 * 1e3:.0f} ms)',
              flush=True)
        async with server._server:
            await server._server.serve_forever()

    asyncio.run(run())


if __name__ == '__main__':
    app.run(main)
