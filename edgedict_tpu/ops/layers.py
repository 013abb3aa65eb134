"""Basic parameterized layers as pure functions on pytrees.

Torch-compatible parameter layouts (Linear stores (out, in) weight) so
reference checkpoints map 1:1.  LayerNorm always computes in fp32 (mixed
precision safety, replacing the reference's apex O1 behavior).
"""

import jax
import jax.numpy as jnp


def linear_init(key, in_size, out_size):
    """PyTorch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    k = 1.0 / jnp.sqrt(in_size)
    k1, k2 = jax.random.split(key)
    return {
        'w': jax.random.uniform(k1, (out_size, in_size), jnp.float32, -k, k),
        'b': jax.random.uniform(k2, (out_size,), jnp.float32, -k, k),
    }


def linear(params, x):
    if 'w_q' in params:      # int8 serving projection (ops/quant.py)
        from edgedict_tpu.ops import quant
        return quant.quant_linear(params, x)
    dtype = x.dtype
    y = jax.lax.dot_general(
        x, params['w'].astype(dtype),
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y + params['b'].astype(jnp.float32)).astype(dtype)


def layer_norm_init(size):
    return {'scale': jnp.ones((size,), jnp.float32),
            'bias': jnp.zeros((size,), jnp.float32)}


def layer_norm(params, x, eps=1e-5):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params['scale'] + params['bias']).astype(dtype)


def embedding_init(key, vocab_size, embed_size, padding_idx=None):
    """PyTorch nn.Embedding default init: N(0, 1); padding row zeroed."""
    table = jax.random.normal(key, (vocab_size, embed_size), jnp.float32)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return {'table': table}


def embedding(params, ids, padding_idx=None):
    """Lookup.  If padding_idx is given, that row reads as zero (and thus
    receives no gradient), matching torch's padding_idx semantics."""
    table = params['table']
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return jnp.take(table, ids, axis=0)


def group_norm_init(num_channels):
    return {'scale': jnp.ones((num_channels,), jnp.float32),
            'bias': jnp.zeros((num_channels,), jnp.float32)}


def group_norm(params, x, num_groups, eps=1e-5):
    """GroupNorm over (B, C, T), computed in fp32 (the reference's
    Fp32GroupNorm, modules/group_norm.py:5-17)."""
    dtype = x.dtype
    b, c, t = x.shape
    x32 = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, t)
    mean = jnp.mean(x32, axis=(2, 3), keepdims=True)
    var = jnp.var(x32, axis=(2, 3), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t)
    y = y * params['scale'][None, :, None] + params['bias'][None, :, None]
    return y.astype(dtype)


def dropout(rng, x, rate, deterministic):
    if deterministic or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
