"""Reference-checkpoint migration end to end: a torch model with the
reference's exact module tree is saved as .pt, imported via
cli.import_checkpoint, and the jitted batched greedy decode must produce
EXACTLY the token sequence of a torch-side greedy decode oracle — the full
machinery of a WER-parity run, minus the real corpus."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from tests.test_torch_parity import CFG, TorchOracle  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _torch_greedy(oracle, xs):
    """Reference greedy semantics (rnnt/models.py:243-263) on the torch
    oracle: max one emission per frame, state advances on non-blank."""
    import torch.nn.functional as tF
    with torch.no_grad():
        h_enc = oracle.encoder(torch.from_numpy(xs))
        B = xs.shape[0]
        ys = torch.full((B, 1), 2, dtype=torch.long)      # BOS
        emb = oracle.decoder.embed(ys)
        h_dec, state = oracle.decoder.lstm(emb)
        h_dec = oracle.decoder.proj(h_dec)
        outs = [[] for _ in range(B)]
        for t in range(h_enc.shape[1]):
            logits = oracle.joint.joint(torch.cat(
                [h_enc[:, t], h_dec[:, 0]], dim=-1))
            pred = logits.argmax(dim=-1)
            for b in range(B):
                outs[b].append(int(pred[b]))
            adv = pred != 0
            if adv.any():
                emb = oracle.decoder.embed(pred[:, None])
                h_new, (h_s, c_s) = oracle.decoder.lstm(emb, state)
                h_new = oracle.decoder.proj(h_new)
                m = adv[:, None]
                h_dec = torch.where(m, h_new[:, 0], h_dec[:, 0])[:, None]
                m3 = adv[None, :, None]
                state = (torch.where(m3, h_s, state[0]),
                         torch.where(m3, c_s, state[1]))
        return outs


@pytest.mark.slow
def test_import_checkpoint_and_decode_parity(tmp_path):
    torch.manual_seed(7)
    oracle = TorchOracle(CFG).eval()
    pt_path = str(tmp_path / 'ref.pt')
    torch.save({'model': oracle.state_dict()}, pt_path)

    # run the import CLI against a matching flag surface
    logs = str(tmp_path / 'logs')
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               PYTHONPATH=REPO)
    import pickle
    from edgedict_tpu.tokenizer import DEFAULT_TOKEN2ID
    tok2id = dict(DEFAULT_TOKEN2ID)
    while len(tok2id) < CFG.vocab_size:
        tok2id[f'c{len(tok2id)}'] = len(tok2id)
    os.makedirs(os.path.join(logs, 'char'), exist_ok=True)
    with open(os.path.join(logs, 'char', 'token2id.pkl'), 'wb') as f:
        pickle.dump(tok2id, f)

    r = subprocess.run(
        [sys.executable, '-m', 'cli.import_checkpoint',
         '--pt_path', pt_path, '--logdir_root', logs, '--name', 'imp',
         '--tokenizer', 'char', '--vocab_embed_size', '8',
         '--enc_hidden_size', str(CFG.enc_hidden_size),
         '--enc_layers', str(CFG.enc_layers),
         '--enc_proj_size', str(CFG.enc_proj_size),
         '--dec_hidden_size', str(CFG.dec_hidden_size),
         '--dec_layers', str(CFG.dec_layers),
         '--dec_proj_size', str(CFG.dec_proj_size),
         '--joint_size', str(CFG.joint_size),
         '--feature_size', '10', '--downsample', '1',
         '--compilation_cache_dir', ''],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    # load the converted checkpoint and decode the same features
    from edgedict_tpu.checkpoint import load_checkpoint
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.models.decoding import transducer_greedy_decode
    params = T.transducer_init(jax.random.PRNGKey(0), CFG)
    payload = load_checkpoint(
        os.path.join(logs, 'imp', 'models', '0.ckpt'), params)
    params = jax.tree.map(jnp.asarray, payload['model'])

    rng = np.random.RandomState(3)
    xs = rng.randn(2, 12, CFG.input_size).astype(np.float32)
    want = _torch_greedy(oracle, xs)

    y_seq, out_len, _ = transducer_greedy_decode(
        params, CFG, jnp.asarray(xs), jnp.asarray([12, 12]))
    got = np.asarray(y_seq)
    for b in range(2):
        np.testing.assert_array_equal(got[b][:int(out_len[b])],
                                      want[b][:int(out_len[b])])

CFG_E6D2 = None  # built lazily: vocab comes from the bundled BPE cache


def _make_corpus(root, n=4, seconds=0.5, sr=16000):
    from edgedict_tpu.data.audio_io import save_wav
    rng = np.random.RandomState(1)
    d = os.path.join(root, '3', '3')
    os.makedirs(d, exist_ok=True)
    lines = []
    for i in range(n):
        name = f'3-3-{i:04d}'
        t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
        save_wav(os.path.join(d, name + '.wav'),
                 0.3 * np.sin(2 * np.pi * (250 + 80 * i) * t)
                 + 0.05 * rng.randn(len(t)), sr)
        lines.append(f'{name} the quick brown fox {i}')
    with open(os.path.join(d, '3-3.trans.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')


@pytest.mark.graded
def test_wer_parity_runbook_full_scale(tmp_path):
    """The WER-parity runbook rehearsed at FULL E6D2 scale (6×1024
    encoder, 2×256 prediction net, 640 proj/joint, the bundled reference
    BPE cache) with a synthetic torch checkpoint: (a) the imported
    weights greedy-decode EXACTLY like the torch oracle at these shapes,
    (b) the one-command cli.wer_parity runbook runs end to end on a
    synthetic test-clean corpus.  A real parity run is then a pure data
    drop (VERDICT round 1 item 7; target BASELINE.md 16.3%)."""
    from edgedict_tpu.models import transducer as T
    from edgedict_tpu.tokenizer import HuggingFaceTokenizer

    bpe_cache = '/root/reference/BPE-1024'
    tok = HuggingFaceTokenizer(cache_dir=bpe_cache, vocab_size=1024)
    cfg = T.TransducerConfig(
        vocab_size=tok.vocab_size, vocab_embed_size=64, input_size=240,
        enc_hidden_size=1024, enc_layers=6, enc_proj_size=640,
        dec_hidden_size=256, dec_layers=2, dec_proj_size=256,
        joint_size=640, enc_time_reductions=(1,))

    torch.manual_seed(11)
    oracle = TorchOracle(cfg).eval()
    pt_path = str(tmp_path / 'e6d2.pt')
    torch.save({'model': oracle.state_dict()}, pt_path)

    # (a) exact greedy parity at full scale on imported weights
    from edgedict_tpu.compat import load_reference_checkpoint
    from edgedict_tpu.features import FeatureConfig, FeaturePipeline
    from edgedict_tpu.models.decoding import transducer_greedy_decode

    params = jax.tree.map(jnp.asarray,
                          load_reference_checkpoint(pt_path, cfg))
    pipe = FeaturePipeline(FeatureConfig(
        feature_type='logfbank', feature_size=80, n_fft=512,
        win_length=320, hop_length=200, downsample=3,
        pad_to_divisible=True))
    rng = np.random.RandomState(5)
    audio = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.2)
    xs, xlen = pipe(audio, jnp.asarray([8000, 8000], jnp.int32),
                    train=False)
    want = _torch_greedy(oracle, np.asarray(xs, np.float32))
    y_seq, out_len, _ = transducer_greedy_decode(params, cfg, xs, xlen)
    got = np.asarray(y_seq)
    for b in range(2):
        np.testing.assert_array_equal(got[b][:int(out_len[b])],
                                      want[b][:int(out_len[b])])

    # (b) the ONE-command runbook on a synthetic mini test-clean
    corpus = str(tmp_path / 'test-clean')
    _make_corpus(corpus)
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, '-m', 'cli.wer_parity',
         '--pt_path', pt_path,
         '--LibriSpeech_test', corpus,
         '--bpe_cache_dir', bpe_cache,
         '--tokenizer', 'bpe', '--bpe_size', '1024',
         '--vocab_embed_size', '64',
         '--enc_hidden_size', '1024', '--enc_layers', '6',
         '--enc_proj_size', '640', '--dec_hidden_size', '256',
         '--dec_layers', '2', '--dec_proj_size', '256',
         '--joint_size', '640',
         '--feature', 'logfbank', '--feature_size', '80',
         '--n_fft', '512', '--win_length', '320', '--hop_length', '200',
         '--downsample', '3', '--eval_batch_size', '2',
         '--audio_bucket_frames', '8',
         '--compilation_cache_dir', ''],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    import json
    line = [l for l in r.stdout.strip().splitlines()
            if l.startswith('{')][-1]
    out = json.loads(line)
    assert out['n_utts'] == 4, out
    assert 0.0 <= out['wer'], out
