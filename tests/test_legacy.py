"""Legacy v1 family (models/legacy.py): torch-oracle parity for the
residual encoder / RNNModel / legacy Transducer, oracle-exact CTC prefix
beam search, CMVN/featurizer properties, v1 tokenizer round trip.

Reference surface: /root/reference/models.py:10-222,
/root/reference/recurrent.py:15-308, /root/reference/modules/tokenizer.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn               # noqa: E402

import jax                          # noqa: E402
import jax.numpy as jnp             # noqa: E402

from edgedict_tpu.models import legacy as L   # noqa: E402


def _np(t):
    return t.detach().numpy()


def _lstm_params(lstm, layer=0):
    return {
        'w_ih': jnp.asarray(_np(getattr(lstm, f'weight_ih_l{layer}'))),
        'w_hh': jnp.asarray(_np(getattr(lstm, f'weight_hh_l{layer}'))),
        'b_ih': jnp.asarray(_np(getattr(lstm, f'bias_ih_l{layer}'))),
        'b_hh': jnp.asarray(_np(getattr(lstm, f'bias_hh_l{layer}'))),
    }


def _linear_params(lin):
    return {'w': jnp.asarray(_np(lin.weight)),
            'b': jnp.asarray(_np(lin.bias))}


def _ln_params(ln):
    return {'scale': jnp.asarray(_np(ln.weight)),
            'bias': jnp.asarray(_np(ln.bias))}


class TorchResidualRNN(nn.Module):
    """Torch mirror of residual_rnn_apply's documented semantics (the
    reference StackedRecurrent's intent — its literal module-index control
    flow crashes for num_layers >= 3, see legacy.py docstring)."""

    def __init__(self, input_size, hidden, num_layers, head):
        super().__init__()
        self.ln_in = nn.LayerNorm(input_size)
        self.lstms = nn.ModuleList(
            [nn.LSTM(input_size, hidden, 1, batch_first=True)]
            + [nn.LSTM(hidden, hidden, 1, batch_first=True)
               for _ in range(num_layers - 1)])
        self.lns = nn.ModuleList(
            [nn.LayerNorm(hidden) for _ in range(num_layers - 1)])
        self.head = nn.Linear(hidden, head) if head else None

    def forward(self, xs):
        xs = self.ln_in(xs)
        for i, lstm in enumerate(self.lstms):
            ys, _ = lstm(xs)
            if i > 0:
                ys = self.lns[i - 1](ys)
            xs = ys + xs if xs.shape[-1] == ys.shape[-1] else ys
        if self.head is not None:
            xs = self.head(xs)
        return xs


def _import_residual_rnn(t):
    p = {
        'ln_in': _ln_params(t.ln_in),
        'layers': [_lstm_params(l) for l in t.lstms],
        'lns': [_ln_params(l) for l in t.lns],
    }
    if t.head is not None:
        p['head'] = _linear_params(t.head)
    return p


def test_residual_rnn_torch_parity():
    torch.manual_seed(0)
    t = TorchResidualRNN(10, 16, 3, head=16).eval()
    params = _import_residual_rnn(t)
    xs = np.random.RandomState(0).randn(2, 7, 10).astype(np.float32)
    with torch.no_grad():
        want = _np(t(torch.from_numpy(xs)))
    got, state = L.residual_rnn_apply(params, jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    assert len(state) == 3 and state[0][0].shape == (2, 16)


def test_residual_rnn_time_reduction_and_state_carry():
    key = jax.random.PRNGKey(1)
    params = L.residual_rnn_init(key, 6, 8, 3)
    xs = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 6))
    ys, _ = L.residual_rnn_apply(params, xs, reduce_before_layer=1)
    assert ys.shape == (2, 5, 8)          # ceil(9/2) after ×2 reduction
    # chunked state carry == full sequence (no reduction)
    full, _ = L.residual_rnn_apply(params, xs)
    st = None
    parts = []
    for lo, hi in ((0, 3), (3, 6), (6, 9)):
        y, st = L.residual_rnn_apply(params, xs[:, lo:hi], state=st)
        parts.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(parts, axis=1)),
                               np.asarray(full), rtol=1e-5, atol=1e-5)


def test_residual_proj_shapes():
    params = L.residual_proj_init(jax.random.PRNGKey(0), 6, 8, 3)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))
    ys, state = L.residual_proj_apply(params, xs)
    assert ys.shape == (2, 5, 4)          # ff_dim = hidden // 2
    assert len(state) == 3


class TorchRNNModel(nn.Module):
    """Reference RNNModel (models.py:13-32) mirror."""

    def __init__(self, input_size, vocab, hidden, layers):
        super().__init__()
        self.spectrum_norm = nn.BatchNorm1d(input_size)
        self.lstm = nn.LSTM(input_size, hidden, layers, batch_first=True)
        self.linear = nn.Linear(hidden, vocab)

    def forward(self, xs):
        xs = self.spectrum_norm(xs.permute(0, 2, 1)).permute(0, 2, 1)
        h, _ = self.lstm(xs)
        return self.linear(h)


def test_rnn_model_torch_parity():
    torch.manual_seed(1)
    t = TorchRNNModel(10, 12, 16, 2).eval()
    # non-trivial running stats
    with torch.no_grad():
        t.spectrum_norm.running_mean.uniform_(-1, 1)
        t.spectrum_norm.running_var.uniform_(0.5, 2.0)
    params = {
        'norm': {'gamma': jnp.asarray(_np(t.spectrum_norm.weight)),
                 'beta': jnp.asarray(_np(t.spectrum_norm.bias)),
                 'mean': jnp.asarray(_np(t.spectrum_norm.running_mean)),
                 'var': jnp.asarray(_np(t.spectrum_norm.running_var))},
        'lstm': {'layers': [_lstm_params(t.lstm, 0),
                            _lstm_params(t.lstm, 1)]},
        'head': _linear_params(t.linear),
    }
    xs = np.random.RandomState(1).randn(3, 6, 10).astype(np.float32)
    with torch.no_grad():
        want = _np(t(torch.from_numpy(xs)))
    got, _ = L.rnn_model_apply(params, jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _brute_force_ctc(logp, blank=0):
    """Sum path probabilities per collapsed label sequence."""
    import itertools
    T, V = logp.shape
    scores = {}
    for path in itertools.product(range(V), repeat=T):
        lp = sum(logp[t, v] for t, v in enumerate(path))
        # collapse: dedup consecutive then drop blanks
        lab = []
        for i, v in enumerate(path):
            if v != blank and (i == 0 or path[i - 1] != v):
                lab.append(v)
        key = tuple(lab)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), lp)
    return scores


def test_ctc_prefix_beam_search_oracle_exact():
    rng = np.random.RandomState(3)
    for trial in range(3):
        logits = rng.randn(4, 3) * 2
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        scores = _brute_force_ctc(logp)
        want = max(scores.items(), key=lambda kv: kv[1])
        # wide beam == exact on this tiny space
        got, neg = L.ctc_prefix_beam_search(logp, beam_width=64)
        assert tuple(got) == want[0], (trial, got, want)
        np.testing.assert_allclose(-neg, want[1], rtol=1e-6)


class TorchLegacyTransducer(nn.Module):
    """Reference legacy Transducer (models.py:46-86) with the oracle
    encoder above standing in for ResidualRNNModel."""

    def __init__(self, cfg):
        super().__init__()
        self.encoder = TorchResidualRNN(cfg.input_size, cfg.hidden_size,
                                        cfg.num_layers, cfg.hidden_size)
        self.embed = nn.Embedding(cfg.vocab_size, cfg.vocab_embed_size,
                                  padding_idx=1)
        self.decoder = nn.LSTM(cfg.vocab_embed_size, cfg.pred_hidden,
                               cfg.pred_num_layers, batch_first=True)
        self.fc1 = nn.Linear(cfg.hidden_size + cfg.pred_hidden,
                             cfg.hidden_size)
        self.fc2 = nn.Linear(cfg.hidden_size, cfg.vocab_size)

    def joint(self, f, g):
        out = torch.cat((f, g), dim=-1)
        out = self.fc1(out)
        out = out / (1 + out.abs())
        return self.fc2(out)

    def forward(self, xs, ys):
        h_enc = self.encoder(xs)
        bos = torch.ones((ys.shape[0], 1), dtype=torch.long)
        ymat, _ = self.decoder(self.embed(torch.cat([bos, ys], dim=-1)))
        f = h_enc.unsqueeze(2).expand(-1, -1, ymat.shape[1], -1)
        g = ymat.unsqueeze(1).expand(-1, h_enc.shape[1], -1, -1)
        return self.joint(f, g)


CFG = L.LegacyTransducerConfig(
    input_size=10, vocab_size=12, vocab_embed_size=6, hidden_size=16,
    num_layers=2, pred_num_layers=1)


def _import_legacy_transducer(t, cfg):
    return {
        'encoder': _import_residual_rnn(t.encoder),
        'embed': {'table': jnp.asarray(_np(t.embed.weight))},
        'decoder': {'layers': [_lstm_params(t.decoder, i)
                               for i in range(cfg.pred_num_layers)]},
        'fc1': _linear_params(t.fc1),
        'fc2': _linear_params(t.fc2),
    }


def test_legacy_transducer_torch_parity():
    torch.manual_seed(2)
    t = TorchLegacyTransducer(CFG).eval()
    params = _import_legacy_transducer(t, CFG)
    rng = np.random.RandomState(2)
    xs = rng.randn(2, 5, CFG.input_size).astype(np.float32)
    ys = rng.randint(2, CFG.vocab_size, (2, 3))
    with torch.no_grad():
        want = _np(t(torch.from_numpy(xs), torch.from_numpy(ys)))
    got = L.legacy_transducer_logits(params, CFG, jnp.asarray(xs),
                                     jnp.asarray(ys, dtype=jnp.int32))
    assert got.shape == (2, 5, 4, CFG.vocab_size)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_legacy_transducer_loss_and_grads():
    params = L.legacy_transducer_init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(4)
    xs = jnp.asarray(rng.randn(2, 5, CFG.input_size), jnp.float32)
    ys = jnp.asarray(rng.randint(2, CFG.vocab_size, (2, 3)), jnp.int32)
    xlen = jnp.asarray([5, 4], jnp.int32)
    ylen = jnp.asarray([3, 2], jnp.int32)
    loss, grads = jax.value_and_grad(L.legacy_transducer_loss)(
        params, CFG, xs, ys, xlen, ylen)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gnorm > 0


def test_legacy_greedy_matches_python_loop():
    params = L.legacy_transducer_init(jax.random.PRNGKey(1), CFG)
    rng = np.random.RandomState(5)
    xs = jnp.asarray(rng.randn(2, 6, CFG.input_size), jnp.float32)
    y_seq, neg_logp = L.legacy_greedy_decode(params, CFG, xs,
                                             jnp.asarray([6, 6]))
    # python-loop oracle over the same params
    h_enc, _ = L.residual_rnn_apply(params['encoder'], xs)
    from edgedict_tpu.ops import rnn
    from edgedict_tpu.ops.layers import embedding
    bos = jnp.full((2, 1), 1, jnp.int32)
    state = rnn.lstm_zero_state(CFG.pred_num_layers, 2, CFG.pred_hidden)
    h_pre, state = rnn.stacked_lstm(
        params['decoder'], embedding(params['embed'], bos, padding_idx=1),
        state)
    h_pre = h_pre[:, 0]
    want = []
    for k in range(6):
        logits = L.legacy_joint(params, h_enc[:, k], h_pre)
        logs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        pred = jnp.argmax(logs, axis=-1).astype(jnp.int32)
        emb = embedding(params['embed'], pred[:, None], padding_idx=1)
        h_new, st_new = rnn.stacked_lstm(params['decoder'], emb, state)
        adv = pred != 0
        h_pre = jnp.where(adv[:, None], h_new[:, 0], h_pre)
        state = jax.tree.map(
            lambda n, o: jnp.where(adv[None, :, None], n, o), st_new, state)
        want.append(np.asarray(pred))
    np.testing.assert_array_equal(np.asarray(y_seq), np.stack(want, axis=1))
    assert np.all(np.isfinite(np.asarray(neg_logp)))


def test_cmvn_sliding_matches_naive():
    rng = np.random.RandomState(6)
    feat = rng.randn(50, 4).astype(np.float32)
    win = 11
    got = L.cmvn_sliding(feat, win_size=win, variance=True)
    half = win // 2
    pad = np.pad(feat.astype(np.float64), ((half, half), (0, 0)),
                 mode='edge')
    want = np.empty_like(feat)
    for t in range(feat.shape[0]):
        w = pad[t:t + win]
        want[t] = (feat[t] - w.mean(0)) / (w.std(0) + 1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_legacy_mfcc_properties():
    rng = np.random.RandomState(7)
    audio = rng.randn(16000).astype(np.float32) * 0.1
    out = L.legacy_mfcc(audio, n_mfcc=13)
    assert out.shape[1] == 13 and out.shape[0] > 70
    assert np.all(np.isfinite(np.asarray(out)))
    # DB clamp: dynamic range of the pre-DCT mel never exceeds top_db
    mel_db = L.amplitude_to_db(jnp.asarray(rng.rand(5, 8) * 1e6))
    assert float(mel_db.max() - mel_db.min()) <= 80.0 + 1e-5
    norm = L.legacy_mfcc(audio, n_mfcc=13, normalize=True)
    assert abs(float(np.asarray(norm).mean())) < 0.5   # roughly centered


def test_instance_norm_and_batch_norm_train_stats():
    xs = jnp.asarray(np.random.RandomState(8).randn(3, 20, 5) * 4 + 2,
                     jnp.float32)
    y = L.instance_norm(xs)
    np.testing.assert_allclose(np.asarray(y.mean(axis=1)), 0, atol=1e-4)
    params = L.batch_norm_init(5)
    y, new = L.batch_norm(params, xs, train=True)
    np.testing.assert_allclose(np.asarray(y).mean((0, 1)), 0, atol=1e-4)
    assert not np.allclose(np.asarray(new['mean']), 0)


def test_legacy_char_tokenizer_round_trip():
    from edgedict_tpu.tokenizer import LegacyCharTokenizer
    tok = LegacyCharTokenizer()
    ids = tok.encode('Hello World 42!')
    assert ids[0] == 1                       # BOS prepended
    assert ids[1:] == tok.encode('hello world 42!')[1:]  # lowercased
    assert tok.decode(ids) == 'hello world 42!'
    assert tok.decode_plus([ids]) == ['hello world 42!']
    # v1 id scheme: specials at 0/1/2, chars from 4, id 3 unassigned
    assert tok.token2id['<blank>'] == 0 and tok.token2id['<unk>'] == 2
    assert 3 not in tok.id2token
    assert tok.unk_id == 2
