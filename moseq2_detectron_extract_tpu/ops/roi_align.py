'''ROIAlign (v2 / aligned) for TPU with static shapes.

Replaces Detectron2's C++/CUDA ROIAlign. Each ROI is sampled on a regular
bilinear grid at 2x the output resolution and 2x2 average-pooled — equivalent
to ROIAlignV2 with sampling_ratio=2 and half-pixel alignment. Multilevel FPN
assignment follows the standard level formula; we compute the pool on the
ROI's assigned level only, via a per-level gather + select (4 levels).
'''
import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_gather(feat, ys, xs):
    '''feat: (H, W, C); ys/xs: (P,) float sample coords. Returns (P, C).

    Out-of-bounds samples clamp to the border (ROIAlign keeps gradients inside
    the map; for aligned=True D2 clamps similarly after the -0.5 shift).
    '''
    h, w, _ = feat.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    top = v00 * (1 - fx)[:, None] + v01 * fx[:, None]
    bot = v10 * (1 - fx)[:, None] + v11 * fx[:, None]
    return top * (1 - fy)[:, None] + bot * fy[:, None]


def _roi_sample_grid(boxes, output_size: int, stride: float):
    '''Sample coords for ROIAlignV2: (K, S, S) ys/xs at 2x resolution.'''
    s = output_size * 2  # sampling_ratio = 2
    x1 = boxes[:, 0] / stride - 0.5
    y1 = boxes[:, 1] / stride - 0.5
    x2 = boxes[:, 2] / stride - 0.5
    y2 = boxes[:, 3] / stride - 0.5
    # bin centers: (i + 0.5)/s of the roi extent
    frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = y1[:, None] + (y2 - y1)[:, None] * frac[None, :]   # (K, S)
    xs = x1[:, None] + (x2 - x1)[:, None] * frac[None, :]
    return ys, xs


def roi_align_level(feat, boxes, output_size: int, stride: float):
    '''ROIAlign of (K, 4) boxes (image coords) on one (H, W, C) level.

    Returns (K, output_size, output_size, C).
    '''
    k = boxes.shape[0]
    c = feat.shape[-1]
    s = output_size * 2
    ys, xs = _roi_sample_grid(boxes, output_size, stride)

    def one(ys_row, xs_row):
        yy = jnp.repeat(ys_row, s)
        xx = jnp.tile(xs_row, s)
        vals = _bilinear_gather(feat, yy, xx)             # (s*s, C)
        vals = vals.reshape(s, s, c)
        # 2x2 average pool -> (out, out, C)
        vals = vals.reshape(output_size, 2, output_size, 2, c).mean(axis=(1, 3))
        return vals

    return jax.vmap(one)(ys, xs)


def assign_fpn_levels(boxes, min_level: int = 2, max_level: int = 5,
                      canonical_size: float = 224.0, canonical_level: int = 4):
    '''FPN level per ROI: floor(canonical + log2(sqrt(area)/224)) clamped.'''
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    sqrt_area = jnp.sqrt(jnp.maximum(area, 1e-6))
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('output_size', 'min_level'))
def multilevel_roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         output_size: int, min_level: int = 2):
    '''Pool (K, 4) boxes from FPN levels P2..P5 -> (K, out, out, C).

    ``features`` is a tuple of (H_l, W_l, C) maps for levels min_level..;
    strides are 2**level. Each ROI is pooled on its assigned level only; the
    per-level pools are computed for all ROIs and combined with a select
    (static shapes; 4x compute on tiny (K, out, out) tensors is cheaper than
    dynamic partitioning on TPU).
    '''
    levels = assign_fpn_levels(boxes, min_level=min_level,
                               max_level=min_level + len(features) - 1)
    out = None
    for i, feat in enumerate(features):
        level = min_level + i
        pooled = roi_align_level(feat, boxes, output_size, float(2 ** level))
        mask = (levels == level)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out
