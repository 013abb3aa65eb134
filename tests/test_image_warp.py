"""Polyharmonic sparse image warp (legacy TimeWrap spline path).

Oracle strategy: polyharmonic splines have two exact mathematical
properties we can pin without any reference code — they INTERPOLATE the
control values, and (with the affine term) they REPRODUCE affine
functions exactly.  The warp itself is pinned by identity/shift
invariants.
"""

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu.ops.image_warp import (
    polyharmonic_interpolate, sparse_image_warp, time_warp_spline)


def test_spline_interpolates_control_values():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(2, 7, 2) * 10)
    vals = jnp.asarray(rng.randn(2, 7, 3))
    out = polyharmonic_interpolate(pts, vals, pts, regularization=1e-9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vals),
                               rtol=1e-3, atol=1e-3)


def test_spline_reproduces_affine_functions():
    """For affine training values f(x) = A x + b, the thin-plate spline's
    rbf weights vanish and the interpolant is exact everywhere."""
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.rand(1, 6, 2) * 8)
    A = rng.randn(2, 2)
    bb = rng.randn(2)
    vals = jnp.einsum('bnd,dk->bnk', pts, jnp.asarray(A)) + bb
    q = jnp.asarray(rng.rand(1, 20, 2) * 8)
    expect = jnp.einsum('bmd,dk->bmk', q, jnp.asarray(A)) + bb
    out = polyharmonic_interpolate(pts, vals, q, regularization=1e-9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-3, atol=1e-3)


def test_warp_zero_flow_is_identity():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(2, 12, 16))
    pts = jnp.asarray([[[4.0, 5.0], [8.0, 11.0]]] * 2)
    warped, flows = sparse_image_warp(img, pts, pts,
                                      num_boundary_points=1)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(flows), 0.0, atol=1e-5)


def test_warp_moves_content_toward_dst():
    """A +3-pixel time shift of the control point moves the image content
    so dst reads what src held (TF convention: output[p] =
    input[p − flow])."""
    img = np.zeros((1, 8, 32), np.float32)
    img[0, :, 10] = 1.0                       # bright column at t=10
    src = jnp.asarray([[[4.0, 10.0]]])
    dst = jnp.asarray([[[4.0, 13.0]]])
    warped, _ = sparse_image_warp(jnp.asarray(img), src, dst,
                                  num_boundary_points=0)
    w = np.asarray(warped)[0]
    # with one control point + no anchors the flow is ~global: the bright
    # column should now appear near t=13 on the control row
    assert w[4].argmax() == 13, w[4].argmax()


def test_time_warp_spline_shape_and_determinism():
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(2, 64, 12).astype(np.float32))
    key = jax.random.PRNGKey(5)
    out1 = time_warp_spline(key, feat, warp_param=8)
    out2 = time_warp_spline(key, feat, warp_param=8)
    assert out1.shape == feat.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert np.abs(np.asarray(out1) - np.asarray(feat)).max() > 1e-3

    # too-short sequences pass through untouched
    short = feat[:, :10]
    np.testing.assert_allclose(
        np.asarray(time_warp_spline(key, short, warp_param=8)),
        np.asarray(short))


def test_features_time_warp_spline_method():
    from edgedict_tpu.features import time_warp
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(1, 48, 8).astype(np.float32))
    key = jax.random.PRNGKey(7)
    out = time_warp(key, feat, warp_param=6, method='spline')
    assert out.shape == feat.shape
