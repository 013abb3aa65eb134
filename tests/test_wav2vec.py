"""wav2vec 2.0: FrontEnd torch-parity, mask planning, end-to-end loss."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edgedict_tpu.models import wav2vec as W

SPEC = ((10, 5, 8), (8, 4, 12), (4, 2, 16))


def test_frontend_shapes_and_lengths():
    key = jax.random.PRNGKey(0)
    params = W.frontend_init(key, SPEC, bias=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2000))
    y = W.frontend_apply(params, x, SPEC)
    assert y.shape[0] == 2 and y.shape[2] == 16
    assert y.shape[1] == W.frontend_output_length(SPEC, 2000)
    assert np.isfinite(np.asarray(y)).all()


def test_frontend_torch_parity():
    torch = pytest.importorskip('torch')
    import torch.nn as nn

    class TorchFrontEnd(nn.Module):
        """Reference FrontEnd geometry (rnnt/models.py:313-365)."""

        def __init__(self, spec, bias=True):
            super().__init__()
            self.spec = spec
            convs, gns = [], []
            in_ch = 1
            for i, (k, s, c) in enumerate(spec):
                convs.append(nn.Conv1d(in_ch, c, k, stride=s,
                                       padding=k - 1, bias=bias))
                if i > 0:
                    gns.append(nn.GroupNorm(1, in_ch))
                in_ch = c
            self.convs = nn.ModuleList(convs)
            self.gns = nn.ModuleList(gns)
            self.ln = nn.LayerNorm(spec[-1][2])

        def forward(self, x):
            x = x.unsqueeze(1)
            for i, conv in enumerate(self.convs):
                if i > 0:
                    x = torch.nn.functional.gelu(x)
                    x = self.gns[i - 1](x)
                x = conv(x)
                x = x[:, :, :-conv.padding[0]]
            return self.ln(x.transpose(1, 2))

    torch.manual_seed(0)
    oracle = TorchFrontEnd(SPEC).eval()
    # import weights into our pytree
    params = {'layers': [], 'ln': {
        'scale': np.asarray(oracle.ln.weight.detach()),
        'bias': np.asarray(oracle.ln.bias.detach())}}
    for i, conv in enumerate(oracle.convs):
        layer = {'w': np.asarray(conv.weight.detach()),
                 'b': np.asarray(conv.bias.detach())}
        if i > 0:
            gn = oracle.gns[i - 1]
            layer['gn'] = {'scale': np.asarray(gn.weight.detach()),
                           'bias': np.asarray(gn.bias.detach())}
        params['layers'].append(layer)

    x = np.random.RandomState(0).randn(2, 1500).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(W.frontend_apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), SPEC))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_compute_mask_indices_properties():
    rng = np.random.RandomState(0)
    mask = W.compute_mask_indices((4, 100), None, mask_prob=0.3,
                                  mask_length=5, min_masks=2, rng=rng)
    counts = mask.sum(axis=1)
    assert (counts == counts[0]).all()      # equalized per row
    assert counts[0] > 0
    idx = W.mask_to_dense_indices(mask)
    assert idx.shape == (4, counts[0])
    for i in range(4):
        assert mask[i, idx[i]].all()


def test_negative_sampling_excludes_self():
    idxs = np.asarray(W.sample_negative_indices(
        jax.random.PRNGKey(0), 2, 10, 5))
    assert idxs.shape == (2, 50)
    tszs = np.repeat(np.arange(10), 5)
    assert (idxs != tszs[None, :]).all()
    assert (idxs >= 0).all() and (idxs < 10).all()


def test_wav2vec_forward_and_loss_grad():
    cfg = W.Wav2VecConfig(
        frontend_params=SPEC, input_size=16, enc_hidden_size=16,
        enc_layers=2, enc_dropout=0.0, enc_proj_size=16,
        num_negatives=4, latent_vars=8, latent_groups=2, final_dim=8)
    params = W.wav2vec_init(jax.random.PRNGKey(0), cfg)
    source = jax.random.normal(jax.random.PRNGKey(1), (2, 2000))
    t_frames = W.frontend_output_length(SPEC, 2000)
    mask = W.compute_mask_indices((2, t_frames), None, 0.4, 3, min_masks=2,
                                  rng=np.random.RandomState(0))
    mask_idx = jnp.asarray(W.mask_to_dense_indices(mask))

    def loss_fn(p, rng):
        res = W.wav2vec_forward(p, cfg, source, mask_idx, temp=1.0,
                                rng=rng, training=True)
        loss, metrics = W.contrastive_loss(res)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert 0 <= int(metrics['correct']) <= int(metrics['count'])
    # gradient flows into codebook (through the ST Gumbel) and mask_emb
    gnorm = float(jnp.linalg.norm(grads['quantizer']['vars']))
    assert np.isfinite(gnorm) and gnorm > 0
    assert float(jnp.linalg.norm(grads['mask_emb'])) > 0


def test_kmeans_vq():
    cfg = W.KmeansVQConfig(dim=16, num_vars=8, groups=2, vq_dim=8)
    params = W.kmeans_vq_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))

    def loss_fn(p):
        out = W.kmeans_vq_apply(p, cfg, x, produce_targets=True)
        return out['kmeans_loss'] + jnp.mean(out['x'] ** 2), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert out['targets'].shape == (2, 6, 2)
    assert float(jnp.linalg.norm(grads['embedding'])) > 0  # latent loss
    assert float(jnp.linalg.norm(grads['proj'])) > 0       # STE + commit


def test_conv_feature_extractor():
    layers = [(8, 10, 5), (12, 4, 2), (16, 4, 2)]
    for mode in ('default', 'layer_norm'):
        params = W.conv_feature_extractor_init(
            jax.random.PRNGKey(0), layers, mode=mode)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1000))
        y = W.conv_feature_extractor_apply(params, layers, x, mode=mode)
        assert y.shape[0] == 2 and y.shape[2] == 16
        assert np.isfinite(np.asarray(y)).all()


# ---------------------------------------------------------------------------
# optional branches (reference rnnt/wav2vec.py:115-145,332-358,456-470 —
# dead config at the reference's call site but part of the model surface)
# ---------------------------------------------------------------------------

def _tiny_cfg(**kw):
    base = dict(frontend_params=SPEC, input_size=16, enc_hidden_size=16,
                enc_layers=2, enc_dropout=0.0, enc_proj_size=16,
                num_negatives=4, latent_vars=8, latent_groups=2,
                final_dim=8)
    base.update(kw)
    return W.Wav2VecConfig(**base)


def _forward_loss(cfg, seed=0, **loss_kw):
    params = W.wav2vec_init(jax.random.PRNGKey(seed), cfg)
    source = jax.random.normal(jax.random.PRNGKey(1), (2, 2000))
    t_frames = W.frontend_output_length(cfg.frontend_params, 2000)
    mask = W.compute_mask_indices((2, t_frames), None, 0.4, 3, min_masks=2,
                                  rng=np.random.RandomState(0))
    mask_idx = jnp.asarray(W.mask_to_dense_indices(mask))

    def loss_fn(p, rng):
        res = W.wav2vec_forward(p, cfg, source, mask_idx, temp=1.0,
                                rng=rng, training=True)
        loss, metrics = W.contrastive_loss(res, **loss_kw)
        return loss, (metrics, res)

    (loss, (metrics, res)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, jax.random.PRNGKey(2))
    return params, loss, metrics, res, grads, mask_idx


def test_sample_negatives_within_and_cross():
    """Within-utterance negatives come from the OWN row's pool; cross
    negatives may come from any row (reference sample_negatives,
    rnnt/wav2vec.py:205-263)."""
    b, tsz, m = 3, 12, 5
    # encode (row, pos) into the feature value
    y = jnp.asarray(np.arange(b)[:, None, None] * 1000
                    + np.arange(tsz)[None, :, None], jnp.float32)
    y = jnp.broadcast_to(y, (b, tsz, 2))
    negs = np.asarray(W.sample_negatives(jax.random.PRNGKey(0), y, m,
                                         n_negatives=6,
                                         cross_sample_negatives=0))
    assert negs.shape == (6, b, m, 2)
    rows = negs[..., 0] // 1000
    assert (rows == np.arange(b)[None, :, None]).all()

    negs = np.asarray(W.sample_negatives(jax.random.PRNGKey(3), y, m,
                                         n_negatives=0,
                                         cross_sample_negatives=8))
    assert negs.shape == (8, b, m, 2)
    rows = np.unique(negs[..., 0] // 1000)
    assert len(rows) > 1            # cross pool spans rows
    # every sampled value is a real candidate
    vals = set(np.asarray(y[..., 0]).reshape(-1).tolist())
    assert set(negs[..., 0].reshape(-1).tolist()) <= vals

    both = np.asarray(W.sample_negatives(jax.random.PRNGKey(4), y, m,
                                         n_negatives=3,
                                         cross_sample_negatives=2))
    assert both.shape == (5, b, m, 2)

    # codebook-only configs sample NO negatives here — empty result, no
    # crash (reference returns an empty tensor, rnnt/wav2vec.py:207-208)
    none = np.asarray(W.sample_negatives(jax.random.PRNGKey(5), y, m,
                                         n_negatives=0,
                                         cross_sample_negatives=0))
    assert none.shape == (0, b, m, 2)


def test_quantize_input_branch():
    """Input VQ: features quantized+projected before masking; gradient
    flows into the input quantizer codebook (rnnt/wav2vec.py:296-302)."""
    cfg = _tiny_cfg(quantize_input=True)
    params, loss, metrics, res, grads, _ = _forward_loss(cfg)
    assert 'input_quantizer' in params and 'project_inp' in params
    assert 'post_extract_proj' not in params   # reference :98-102 condition
    assert np.isfinite(float(loss))
    assert 'input_prob_perplexity' in res
    assert float(jnp.linalg.norm(grads['input_quantizer']['vars'])) > 0
    assert float(jnp.linalg.norm(grads['project_inp']['w'])) > 0


def test_quantize_input_same_quantizer():
    """same_quantizer shares the target VQ codebook (rnnt/wav2vec.py:
    140-143): no separate input_quantizer params, still trains."""
    cfg = _tiny_cfg(quantize_input=True, same_quantizer=True)
    params, loss, metrics, res, grads, _ = _forward_loss(cfg)
    assert 'input_quantizer' not in params and 'project_inp' in params
    assert np.isfinite(float(loss))
    assert float(jnp.linalg.norm(grads['quantizer']['vars'])) > 0


def test_negatives_from_everywhere_and_codebook():
    """negatives_from_everywhere + cross-sample + codebook negatives
    (rnnt/wav2vec.py:332-347): logit row count grows accordingly."""
    cfg = _tiny_cfg(negatives_from_everywhere=True,
                    cross_sample_negatives=3, codebook_negatives=2)
    params, loss, metrics, res, grads, mask_idx = _forward_loss(cfg)
    n_total = 1 + cfg.num_negatives + cfg.cross_sample_negatives \
        + cfg.codebook_negatives
    assert res['logits'].shape[0] == n_total
    assert res['logits'].shape[2] == mask_idx.shape[1]
    assert np.isfinite(float(loss))
    assert float(jnp.linalg.norm(grads['quantizer']['vars'])) > 0

    # codebook-ONLY negatives (num_negatives=0, cross=0): the sampled-
    # negative block is empty but the forward still trains
    cfg = _tiny_cfg(num_negatives=0, cross_sample_negatives=0,
                    codebook_negatives=2)
    params, loss, metrics, res, grads, mask_idx = _forward_loss(cfg)
    assert res['logits'].shape[0] == 1 + 2
    assert np.isfinite(float(loss))


def test_negatives_from_everywhere_unquantized():
    cfg = _tiny_cfg(quantize_targets=False, negatives_from_everywhere=True)
    params, loss, metrics, res, grads, _ = _forward_loss(cfg)
    assert np.isfinite(float(loss))
    assert float(jnp.linalg.norm(grads['project_q']['w'])) > 0


def test_codebook_sampler_draws_real_codewords():
    cfg = W.GumbelVQConfig(dim=16, num_vars=8, groups=2, vq_dim=8)
    params = W.gumbel_vq_init(jax.random.PRNGKey(0), cfg)
    z = np.asarray(W.gumbel_vq_sample_codebook(
        params, cfg, jax.random.PRNGKey(1), b=6, n=3))
    assert z.shape == (6, 3, 8)
    # each half of the vq_dim must be one of that group's codewords
    codebook = np.asarray(params['vars'][0])         # (G*V, var_dim)
    for g in range(cfg.groups):
        pool = codebook[g * cfg.num_vars:(g + 1) * cfg.num_vars]
        got = z[..., g * 4:(g + 1) * 4].reshape(-1, 4)
        for row in got:
            assert np.isclose(pool, row[None]).all(axis=1).any()


def test_bce_criterion_mode():
    """infonce=False = elementwise BCE-with-logits, positive row target 1
    (reference rnnt/wav2vec.py:463-470; its own get_targets cannot
    broadcast — semantics follow the fairseq criterion it vendors)."""
    logits = jnp.asarray([[[5.0]], [[-5.0]], [[-np.inf]]])  # (3, 1, 1)
    loss, metrics = W.contrastive_loss(
        {'logits': logits, 'features_pen': jnp.asarray(0.0)},
        features_pen_weight=0.0, infonce=False)
    expect = float(np.log1p(np.exp(-5.0)) * 2)     # pos + one real neg
    assert np.isclose(float(loss), expect, rtol=1e-5)

    # and end-to-end: finite loss + flowing grads under BCE
    cfg = _tiny_cfg()
    params, loss, metrics, res, grads, _ = _forward_loss(
        cfg, infonce=False)
    assert np.isfinite(float(loss))
    assert float(jnp.linalg.norm(grads['mask_emb'])) > 0
