"""Checkpoint-import parity: a PyTorch model with the reference's exact
module tree (rebuilt here as a test oracle from the documented architecture,
reference rnnt/models.py:32-241) must produce the same outputs as the JAX
model loaded from its state_dict — validating gate order, bias handling,
LayerNorm placement, BOS-pad convention and the column-split joint."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn          # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

from edgedict_tpu.compat import (  # noqa: E402
    convert_lightning2normal, transducer_from_state_dict)
from edgedict_tpu.models import transducer as T  # noqa: E402

PAD, BOS = 1, 2

CFG = T.TransducerConfig(
    vocab_size=20, vocab_embed_size=8, input_size=10,
    enc_hidden_size=16, enc_layers=3, enc_proj_size=12,
    dec_hidden_size=14, dec_layers=2, dec_proj_size=12,
    joint_size=16, enc_time_reductions=(1,))


class TorchOracle(nn.Module):
    """Minimal torch mirror with the reference's state_dict key layout."""

    def __init__(self, cfg):
        super().__init__()
        # encoder
        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm = nn.LayerNorm(cfg.input_size)

                class Stack(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.lstms = nn.ModuleList()
                        self.projs = nn.ModuleList()
                        in_size = cfg.input_size
                        for i in range(cfg.enc_layers):
                            self.lstms.append(nn.LSTM(
                                in_size, cfg.enc_hidden_size, 1,
                                batch_first=True))
                            self.projs.append(nn.Sequential(
                                nn.LayerNorm(cfg.enc_hidden_size)))
                            in_size = cfg.enc_hidden_size
                self.lstm = Stack()
                self.proj = nn.Linear(cfg.enc_hidden_size,
                                      cfg.enc_proj_size)

            def forward(self, xs):
                xs = self.norm(xs)
                for i, (lstm, proj) in enumerate(
                        zip(self.lstm.lstms, self.lstm.projs)):
                    ys, _ = lstm(xs)
                    xs = ys if i == 0 else xs + ys
                    xs = proj(xs)
                    if i in CFG.enc_time_reductions:
                        b, t, h = xs.shape
                        pad = (-t) % CFG.reduction_factor
                        if pad:
                            xs = tF.pad(xs, (0, 0, 0, pad))
                        xs = xs.reshape(b, -1, CFG.reduction_factor,
                                        h).mean(dim=2)
                return self.proj(xs)
        self.encoder = Enc()

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.embed = nn.Embedding(cfg.vocab_size,
                                          cfg.vocab_embed_size,
                                          padding_idx=PAD)
                self.lstm = nn.LSTM(cfg.vocab_embed_size,
                                    cfg.dec_hidden_size,
                                    cfg.dec_layers, batch_first=True)
                self.proj = nn.Linear(cfg.dec_hidden_size,
                                      cfg.dec_proj_size)

            def forward(self, ys):
                ys = tF.pad(ys, [1, 0, 0, 0], value=BOS).long()
                ys, _ = self.lstm(self.embed(ys))
                return self.proj(ys)
        self.decoder = Dec()

        class Joint(nn.Module):
            def __init__(self):
                super().__init__()
                self.joint = nn.Sequential(
                    nn.Linear(cfg.enc_proj_size + cfg.dec_proj_size,
                              cfg.joint_size),
                    nn.Tanh(),
                    nn.Linear(cfg.joint_size, cfg.vocab_size))

            def forward(self, h_enc, h_dec):
                h_enc = h_enc.unsqueeze(2).expand(
                    -1, -1, h_dec.size(1), -1)
                h_dec = h_dec.unsqueeze(1).expand(
                    -1, h_enc.size(1), -1, -1)
                return self.joint(torch.cat([h_enc, h_dec], dim=-1))
        self.joint = Joint()


@pytest.fixture(scope='module')
def models():
    torch.manual_seed(0)
    oracle = TorchOracle(CFG).eval()
    params = transducer_from_state_dict(oracle.state_dict(), CFG)
    params = jax.tree.map(jnp.asarray, params)
    return oracle, params


def test_full_forward_parity(models):
    oracle, params = models
    rng = np.random.RandomState(0)
    xs = rng.randn(2, 8, CFG.input_size).astype(np.float32)
    ys = rng.randint(4, CFG.vocab_size, (2, 5)).astype(np.int64)

    with torch.no_grad():
        h_enc_t = oracle.encoder(torch.from_numpy(xs))
        h_dec_t = oracle.decoder(torch.from_numpy(ys))
        logits_t = oracle.joint(h_enc_t, h_dec_t).numpy()

    h_enc_j, _ = T.encoder_apply(params['encoder'], CFG, jnp.asarray(xs))
    h_dec_j, _ = T.decoder_apply(params['decoder'], CFG,
                                 jnp.asarray(ys, jnp.int32))
    np.testing.assert_allclose(np.asarray(h_enc_j), h_enc_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_dec_j), h_dec_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    logits_j = T.joint_apply(params['joint'], h_enc_j, h_dec_j)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               rtol=1e-3, atol=1e-4)


def test_lightning_conversion():
    sd = {'state_dict': {'model.encoder.norm.weight': torch.ones(3),
                         'other': torch.zeros(1)}}
    out = convert_lightning2normal(sd)
    assert 'encoder.norm.weight' in out['model']
    plain = convert_lightning2normal({'model': {'a': torch.ones(1)}})
    assert 'a' in plain['model']


def test_pt_checkpoint_roundtrip(tmp_path, models):
    oracle, params = models
    path = tmp_path / 'ref.pt'
    torch.save({'model': oracle.state_dict()}, str(path))
    from edgedict_tpu.compat import load_reference_checkpoint
    loaded = load_reference_checkpoint(str(path), CFG)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
