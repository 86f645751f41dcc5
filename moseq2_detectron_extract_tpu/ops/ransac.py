'''Plane RANSAC on device.

Replaces the 1000-iteration python loop of m2de/proc/roi.py:136-212
(``plane_ransac``): all hypothesis triples are drawn up-front with the JAX
PRNG and evaluated inside one jitted scan, preserving the reference's exact
sequential accept criterion (inlier ratio, strictly-more inliers, strictly
smaller mean distance).
'''
import functools

import jax
import jax.numpy as jnp


def _plane_from_3_points(points):
    '''Plane [a,b,c,d] (ax+by+cz+d=0, unit normal) through 3 points;
    NaNs for degenerate triples (m2de/proc/roi.py:107-133).'''
    a = points[1] - points[0]
    b = points[2] - points[0]
    normal = jnp.cross(a, b)
    denom = jnp.sum(jnp.square(normal))
    ok = denom >= jnp.asarray(2.220446049250313e-16, denom.dtype)  # np.spacing(1)
    normal = normal / jnp.sqrt(jnp.maximum(denom, 1e-30))
    d = -jnp.dot(points[0], normal)
    plane = jnp.concatenate([normal, d[None]])
    return jnp.where(ok, plane, jnp.nan)


@functools.partial(jax.jit, static_argnames=('iters',))
def _plane_ransac_impl(depth_image, valid, key, iters, noise_tolerance, in_ratio):
    h, w = depth_image.shape
    ygrid = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xgrid = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    coords = jnp.stack([xgrid.ravel(), ygrid.ravel(),
                        depth_image.astype(jnp.float32).ravel()], axis=1)  # (P, 3)
    validf = valid.ravel().astype(jnp.float32)
    npoints = jnp.maximum(jnp.sum(validf), 1.0)

    # draw all hypothesis triples up front (with replacement, valid points only)
    probs = validf / npoints
    idx = jax.random.choice(key, coords.shape[0], shape=(iters, 3), replace=True, p=probs)
    triples = coords[idx]  # (iters, 3, 3)
    planes = jax.vmap(_plane_from_3_points)(triples)  # (iters, 4)
    bad = jnp.any(jnp.isnan(planes), axis=1)
    safe_planes = jnp.where(bad[:, None], 0.0, planes)

    # score ALL candidates with one (P, 3) @ (3, iters) matmul (MXU-friendly)
    dists_all = jnp.abs(coords @ safe_planes[:, :3].T + safe_planes[None, :, 3])
    dists_all = dists_all * validf[:, None]
    ninliers_all = jnp.sum((dists_all < noise_tolerance) & (validf[:, None] > 0),
                           axis=0).astype(jnp.float32)
    mean_dist_all = jnp.sum(dists_all, axis=0) / npoints

    # sequential accept criterion over precomputed scalars (cheap scan)
    def step(carry, cand):
        best_idx, best_num, best_dist = carry
        i, is_bad, ninliers, mean_dist = cand
        accept = ((is_bad < 0.5) & ((ninliers / npoints) > in_ratio)
                  & (ninliers > best_num) & (mean_dist < best_dist))
        best_idx = jnp.where(accept, i, best_idx)
        best_num = jnp.where(accept, ninliers, best_num)
        best_dist = jnp.where(accept, mean_dist, best_dist)
        return (best_idx, best_num, best_dist), None

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(0.0), jnp.asarray(jnp.inf))
    cands = (jnp.arange(iters, dtype=jnp.int32), bad.astype(jnp.float32),
             ninliers_all, mean_dist_all)
    (best_idx, _, _), _ = jax.lax.scan(step, init, cands)
    best_plane = safe_planes[best_idx]

    dists = jnp.abs(coords @ best_plane[:3] + best_plane[3])
    return best_plane, dists


def plane_ransac(depth_image, depth_range=(650, 750), iters: int = 1000,
                 noise_tolerance: float = 30.0, in_ratio: float = 0.1,
                 mask=None, seed: int = 0):
    '''RANSAC plane fit to a depth image.

    Returns (plane [a,b,c,d], dists) where dists holds every pixel's absolute
    distance to the plane (flattened), parity with m2de/proc/roi.py:136-212.
    '''
    depth_image = jnp.asarray(depth_image)
    valid = (depth_image > depth_range[0]) & (depth_image < depth_range[1])
    if mask is not None:
        valid = valid & jnp.asarray(mask, jnp.bool_)
    key = jax.random.PRNGKey(seed)
    plane, dists = _plane_ransac_impl(depth_image, valid, key, int(iters),
                                      float(noise_tolerance), float(in_ratio))
    return plane, dists
