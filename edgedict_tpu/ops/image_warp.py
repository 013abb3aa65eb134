"""Jittable polyharmonic-spline sparse image warp (legacy SpecAugment
TimeWrap support).

Rebuild of the reference's `sparse_img_wrap.py` (a torch port of TF's
`sparse_image_warp`, reference sparse_img_wrap.py:9-351) used by the legacy
`TimeWrap` augmentation (reference augmentation.py:26-51):

  1. fit a polyharmonic spline (order 2 = thin-plate) to the control-point
     flows (dest − src),
  2. evaluate the spline on the dense pixel grid → dense flow field,
  3. bilinearly resample the image at grid − flow (edge-clamped).

Deliberate deviations from the reference, both documented here because the
reference's own numerics are degenerate at its call site:

  * The spline solve uses a deterministic ridge (`regularization`) on the
    polynomial block instead of the reference's `randn()/1e10` noise
    injection (sparse_img_wrap.py:  "Pytorch gesv fails with zeros…") —
    with ONE control point and no boundary anchors the exact system is
    singular, and the reference makes it solvable with random jitter.  A
    small deterministic ridge yields the same qualitative warp without
    run-to-run nondeterminism inside jit.
  * The TimeWrap wrapper uses the chosen time INDEX as the control-point
    coordinate.  The reference passes the spectrogram VALUE at that index
    (`point_to_warp = horizontal_line_at_ctr[randrange(...)]`,
    augmentation.py:42-48) — a port bug that makes the control point land
    at an arbitrary (usually tiny negative) time coordinate.

All paths are jittable: fixed shapes, `jnp.linalg.solve`, gather-based
bilinear sampling.
"""

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-10


def _phi(r2, order):
    """Polyharmonic radial basis φ_k evaluated on SQUARED distances r2
    (reference sparse_img_wrap.py:phi)."""
    r2 = jnp.maximum(r2, _EPS)
    if order == 1:
        return jnp.sqrt(r2)
    if order == 2:
        return 0.5 * r2 * jnp.log(r2)
    if order == 4:
        return 0.5 * jnp.square(r2) * jnp.log(r2)
    if order % 2 == 0:
        return 0.5 * jnp.power(r2, 0.5 * order) * jnp.log(r2)
    return jnp.power(r2, 0.5 * order)


def _cross_sq_dist(x, y):
    """(b, n, d) × (b, m, d) → (b, n, m) pairwise squared distances."""
    xn = jnp.sum(x * x, axis=-1)
    yn = jnp.sum(y * y, axis=-1)
    return (xn[:, :, None] - 2.0 * jnp.einsum('bnd,bmd->bnm', x, y)
            + yn[:, None, :])


def polyharmonic_solve(train_points, train_values, order=2,
                       regularization=1e-6):
    """Fit w (rbf weights, (b,n,k)) and v (affine term, (b,d+1,k)) so that
    f(x) = Σ_i w_i φ(|x − c_i|) + [x, 1]·v interpolates train_values.

    The block system follows the polyharmonic-spline normal equations
    (reference solve_interpolation); `regularization` is a deterministic
    ridge added to BOTH diagonal blocks so the system stays solvable even
    in the reference's degenerate one-control-point configuration."""
    b, n, d = train_points.shape
    k = train_values.shape[-1]
    c = train_points.astype(jnp.float32)
    f = train_values.astype(jnp.float32)

    mat_a = _phi(_cross_sq_dist(c, c), order)               # (b, n, n)
    mat_a = mat_a + regularization * jnp.eye(n)[None]
    ones = jnp.ones((b, n, 1), jnp.float32)
    mat_b = jnp.concatenate([c, ones], axis=2)              # (b, n, d+1)

    left = jnp.concatenate([mat_a, jnp.swapaxes(mat_b, 1, 2)], axis=1)
    lower_right = regularization * jnp.eye(d + 1)[None] \
        * jnp.ones((b, 1, 1), jnp.float32)
    right = jnp.concatenate([mat_b, lower_right], axis=1)
    lhs = jnp.concatenate([left, right], axis=2)            # (b, n+d+1, …)
    rhs = jnp.concatenate([f, jnp.zeros((b, d + 1, k), jnp.float32)],
                          axis=1)
    sol = jnp.linalg.solve(lhs, rhs)
    return sol[:, :n], sol[:, n:]


def polyharmonic_interpolate(train_points, train_values, query_points,
                             order=2, regularization=1e-6):
    """Evaluate the fitted spline at query_points (b, m, d) → (b, m, k)."""
    w, v = polyharmonic_solve(train_points, train_values, order,
                              regularization)
    q = query_points.astype(jnp.float32)
    rbf = jnp.einsum(
        'bmn,bnk->bmk',
        _phi(_cross_sq_dist(q, train_points.astype(jnp.float32)), order), w)
    ones = jnp.ones(q.shape[:-1] + (1,), jnp.float32)
    linear = jnp.einsum('bmd,bdk->bmk',
                        jnp.concatenate([q, ones], axis=-1), v)
    return rbf + linear


def _bilinear_sample(image, coords):
    """image (b, h, w), coords (b, m, 2) in (y, x) → (b, m); edge-clamped
    bilinear interpolation (reference interpolate_bilinear)."""
    b, h, w = image.shape
    y = jnp.clip(coords[..., 0], 0.0, h - 1.0)
    x = jnp.clip(coords[..., 1], 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    wy = y - y0
    wx = x - x0

    flat = image.reshape(b, h * w)

    def take(yy, xx):
        return jnp.take_along_axis(flat, yy * w + xx, axis=1)

    top = take(y0, x0) * (1 - wx) + take(y0, x0 + 1) * wx
    bot = take(y0 + 1, x0) * (1 - wx) + take(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def sparse_image_warp(image, src_points, dst_points, order=2,
                      regularization=1e-6, num_boundary_points=0):
    """Warp `image` (b, h, w) so content at src_points moves to dst_points.

    Flow is interpolated from the control points with a polyharmonic
    spline, then the image is resampled at grid − flow (so the pixel at a
    dst location reads back from the corresponding src location — the TF /
    reference convention).  `num_boundary_points` > 0 adds that many
    zero-flow anchor points per image edge (the reference declares this
    parameter but its implementation is commented out; anchors keep the
    warp local, matching SpecAugment's intent).

    Returns (warped (b, h, w), dense_flows (b, h, w, 2))."""
    b, h, w = image.shape
    flows = (dst_points - src_points).astype(jnp.float32)
    ctrl = dst_points.astype(jnp.float32)

    if num_boundary_points > 0:
        ys = jnp.linspace(0.0, h - 1.0, num_boundary_points + 2)
        xs = jnp.linspace(0.0, w - 1.0, num_boundary_points + 2)
        edge = jnp.concatenate([
            jnp.stack([ys, jnp.zeros_like(ys)], -1),
            jnp.stack([ys, jnp.full_like(ys, w - 1.0)], -1),
            jnp.stack([jnp.zeros_like(xs[1:-1]), xs[1:-1]], -1),
            jnp.stack([jnp.full_like(xs[1:-1], h - 1.0), xs[1:-1]], -1),
        ], axis=0)                                          # (e, 2)
        edge = jnp.broadcast_to(edge[None], (b,) + edge.shape)
        ctrl = jnp.concatenate([ctrl, edge], axis=1)
        flows = jnp.concatenate(
            [flows, jnp.zeros_like(edge)], axis=1)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    grid = jnp.stack([yy, xx], axis=-1).reshape(1, h * w, 2)
    grid = jnp.broadcast_to(grid, (b, h * w, 2))

    dense = polyharmonic_interpolate(ctrl, flows, grid, order,
                                     regularization)       # (b, h*w, 2)
    warped = _bilinear_sample(image, grid - dense)
    return warped.reshape(b, h, w), dense.reshape(b, h, w, 2)


@partial(jax.jit, static_argnames=('warp_param', 'num_boundary_points'))
def time_warp_spline(key, feat, warp_param=80, num_boundary_points=1):
    """Legacy TimeWrap with the full 2-D spline warp (reference
    augmentation.py:26-51): a control point at (F//2, t0) with t0 ~
    U[W, T−W) is displaced along time by w ~ U[−W, W]; boundary anchors
    keep the warp local.  feat: (B, T, F) — transposed internally to the
    reference's (F, T) image orientation."""
    b, t, f = feat.shape
    if t <= 2 * warp_param + 1:
        return feat
    k1, k2 = jax.random.split(key)
    t0 = jax.random.randint(k1, (b,), warp_param, t - warp_param)
    shift = jax.random.randint(k2, (b,), -warp_param, warp_param + 1)
    y = jnp.full((b,), f // 2, jnp.float32)
    src = jnp.stack([y, t0.astype(jnp.float32)], -1)[:, None]      # (b,1,2)
    dst = jnp.stack([y, (t0 + shift).astype(jnp.float32)], -1)[:, None]
    img = jnp.swapaxes(feat, 1, 2).astype(jnp.float32)             # (b,f,t)
    warped, _ = sparse_image_warp(
        img, src, dst, num_boundary_points=num_boundary_points)
    return jnp.swapaxes(warped, 1, 2).astype(feat.dtype)
