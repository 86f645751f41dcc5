'''ROIAlign (v2 / aligned) for TPU with static shapes and bounded memory.

Replaces Detectron2's C++/CUDA ROIAlign. Each ROI is sampled on a regular
bilinear grid at 2x the output resolution and 2x2 average-pooled — equivalent
to ROIAlignV2 with sampling_ratio=2 and half-pixel alignment.

Multilevel design: all FPN levels are flattened into ONE (sum_l H_l*W_l, C)
buffer; each ROI computes flat gather indices on its assigned level (offset
arithmetic), so a single gather serves every level — no per-level compute or
4x memory. Proposals are processed in fixed-size chunks via ``lax.map`` to
bound the bilinear-sample intermediates (the naive all-at-once version OOMs a
16G chip at 32 x 1000 proposals).
'''
import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def assign_fpn_levels(boxes, min_level: int = 2, max_level: int = 5,
                      canonical_size: float = 224.0, canonical_level: int = 4):
    '''FPN level per ROI: floor(canonical + log2(sqrt(area)/224)) clamped.'''
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    sqrt_area = jnp.sqrt(jnp.maximum(area, 1e-6))
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def _roi_sample_coords(boxes, output_size: int, strides):
    '''Half-pixel-aligned sample coords at 2x resolution, in the units of each
    ROI's assigned level. Returns (ys, xs) of shape (K, S) and levels (K,).'''
    s = output_size * 2
    frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    xs_img = x1[:, None] + (x2 - x1)[:, None] * frac[None, :]
    ys_img = y1[:, None] + (y2 - y1)[:, None] * frac[None, :]
    xs = xs_img / strides[:, None] - 0.5
    ys = ys_img / strides[:, None] - 0.5
    return ys, xs


def _flatten_pyramid(features: Sequence[jnp.ndarray]):
    '''Stack levels into (P_total, C) + per-level (offset, H, W) tables.'''
    flats = []
    offsets = []
    heights = []
    widths = []
    off = 0
    for feat in features:
        h, w, c = feat.shape
        flats.append(feat.reshape(h * w, c))
        offsets.append(off)
        heights.append(h)
        widths.append(w)
        off += h * w
    return (jnp.concatenate(flats, axis=0), jnp.asarray(offsets, jnp.int32),
            jnp.asarray(heights, jnp.int32), jnp.asarray(widths, jnp.int32))


@functools.partial(jax.jit, static_argnames=('output_size', 'min_level', 'chunk'))
def multilevel_roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         output_size: int, min_level: int = 2,
                         chunk: int = 128):
    '''Pool (K, 4) boxes from FPN levels -> (K, out, out, C).

    ``features``: tuple of (H_l, W_l, C) maps for levels min_level..;
    strides are 2**level.
    '''
    flat, offsets, heights, widths = _flatten_pyramid(features)
    c = flat.shape[-1]
    k = boxes.shape[0]
    s = output_size * 2

    levels = assign_fpn_levels(boxes, min_level=min_level,
                               max_level=min_level + len(features) - 1)
    level_idx = levels - min_level
    strides = jnp.asarray([2.0 ** (min_level + i) for i in range(len(features))],
                          jnp.float32)[level_idx]
    ys, xs = _roi_sample_coords(boxes, output_size, strides)  # (K, S)

    roi_off = offsets[level_idx]      # (K,)
    roi_h = heights[level_idx]
    roi_w = widths[level_idx]

    # clamp sample coords to the level map (border replication, ROIAlign-style)
    ys = jnp.clip(ys, 0.0, (roi_h - 1).astype(jnp.float32)[:, None])
    xs = jnp.clip(xs, 0.0, (roi_w - 1).astype(jnp.float32)[:, None])
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)  # (K, S)
    fx = (xs - x0)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, (roi_h - 1)[:, None])
    x1 = jnp.minimum(x0 + 1, (roi_w - 1)[:, None])

    # pad K to a multiple of chunk for the map
    pad = (-k) % chunk
    def pad_rows(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    y0p, y1p, x0p, x1p = map(pad_rows, (y0, y1, x0, x1))
    fyp, fxp = map(pad_rows, (fy, fx))
    roi_offp = jnp.pad(roi_off, (0, pad))
    roi_wp = jnp.pad(roi_w, (0, pad), constant_values=1)

    def pool_chunk(args):
        cy0, cy1, cx0, cx1, cfy, cfx, coff, cw = args
        # flat indices: off + y * W + x  -> gather 4 taps, (chunk, S, S, C)
        def flat_idx(yy, xx):
            return (coff[:, None, None] + yy[:, :, None] * cw[:, None, None]
                    + xx[:, None, :])
        v00 = flat[flat_idx(cy0, cx0)]
        v01 = flat[flat_idx(cy0, cx1)]
        v10 = flat[flat_idx(cy1, cx0)]
        v11 = flat[flat_idx(cy1, cx1)]
        wy = cfy[:, :, None, None]
        wx = cfx[:, None, :, None]
        vals = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
                + (v10 * (1 - wx) + v11 * wx) * wy)
        # 2x2 average pool (S = 2*out)
        vals = vals.reshape(vals.shape[0], output_size, 2, output_size, 2, c)
        return vals.mean(axis=(2, 4))

    n_chunks = (k + pad) // chunk
    def reshape_chunks(a):
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    # remat: without it the backward pass saves every chunk's bilinear taps
    # stacked across lax.map iterations — (n_chunks, chunk, S, S, C) f32 per
    # tap, ~1.5G each at training shapes, which OOMs the chip. Recomputing
    # the gathers in the backward is near-free next to that.
    pooled = jax.lax.map(jax.checkpoint(pool_chunk), tuple(map(reshape_chunks, (
        y0p, y1p, x0p, x1p, fyp, fxp, roi_offp, roi_wp))))
    pooled = pooled.reshape((n_chunks * chunk, output_size, output_size, c))
    return pooled[:k]


@functools.partial(jax.jit, static_argnames=('output_size', 'min_level', 'chunk'))
def batched_multilevel_roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                                 output_size: int, min_level: int = 2,
                                 chunk: int = 128):
    '''Pool (B, K, 4) boxes from batched FPN levels (B, H_l, W_l, C) ->
    (B, K, out, out, C).

    The batch dimension folds into the flattened pyramid (per-image offsets),
    so peak memory is bounded by ``chunk`` ROIs regardless of batch size.
    '''
    b, k = boxes.shape[:2]
    c = features[0].shape[-1]
    level_sizes = [f.shape[1] * f.shape[2] for f in features]
    per_image = sum(level_sizes)

    # flat buffer: image-major, level-minor
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in features], axis=1)
    flat = flat.reshape(b * per_image, c)

    level_offsets = []
    off = 0
    for size in level_sizes:
        level_offsets.append(off)
        off += size
    offsets = jnp.asarray(level_offsets, jnp.int32)
    heights = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    widths = jnp.asarray([f.shape[2] for f in features], jnp.int32)

    flat_boxes = boxes.reshape(b * k, 4)
    image_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)

    pooled = _pool_from_flat(flat, flat_boxes,
                             image_idx * per_image, offsets, heights, widths,
                             output_size, min_level, len(features), chunk)
    return pooled.reshape(b, k, output_size, output_size, c)


def _pool_from_flat(flat, boxes, image_offsets, level_offsets, heights, widths,
                    output_size, min_level, n_levels, chunk):
    c = flat.shape[-1]
    k = boxes.shape[0]

    levels = assign_fpn_levels(boxes, min_level=min_level,
                               max_level=min_level + n_levels - 1)
    level_idx = levels - min_level
    stride_table = jnp.asarray([2.0 ** (min_level + i) for i in range(n_levels)],
                               jnp.float32)
    strides = stride_table[level_idx]
    ys, xs = _roi_sample_coords(boxes, output_size, strides)  # (K, S)

    roi_off = image_offsets + level_offsets[level_idx]
    roi_h = heights[level_idx]
    roi_w = widths[level_idx]

    ys = jnp.clip(ys, 0.0, (roi_h - 1).astype(jnp.float32)[:, None])
    xs = jnp.clip(xs, 0.0, (roi_w - 1).astype(jnp.float32)[:, None])
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, (roi_h - 1)[:, None])
    x1 = jnp.minimum(x0 + 1, (roi_w - 1)[:, None])

    pad = (-k) % chunk

    def pad_rows(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    y0p, y1p, x0p, x1p, fyp, fxp = map(pad_rows, (y0, y1, x0, x1, fy, fx))
    roi_offp = jnp.pad(roi_off, (0, pad))
    roi_wp = jnp.pad(roi_w, (0, pad), constant_values=1)

    def pool_chunk(args):
        cy0, cy1, cx0, cx1, cfy, cfx, coff, cw = args

        def flat_idx(yy, xx):
            return (coff[:, None, None] + yy[:, :, None] * cw[:, None, None]
                    + xx[:, None, :])

        v00 = flat[flat_idx(cy0, cx0)]
        v01 = flat[flat_idx(cy0, cx1)]
        v10 = flat[flat_idx(cy1, cx0)]
        v11 = flat[flat_idx(cy1, cx1)]
        wy = cfy[:, :, None, None]
        wx = cfx[:, None, :, None]
        vals = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
                + (v10 * (1 - wx) + v11 * wx) * wy)
        vals = vals.reshape(vals.shape[0], output_size, 2, output_size, 2, c)
        return vals.mean(axis=(2, 4))

    n_chunks = (k + pad) // chunk

    def reshape_chunks(a):
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    # remat: see multilevel_roi_align — prevents the backward from storing
    # all chunks' bilinear-tap residuals stacked across lax.map iterations
    pooled = jax.lax.map(jax.checkpoint(pool_chunk), tuple(map(reshape_chunks, (
        y0p, y1p, x0p, x1p, fyp, fxp, roi_offp, roi_wp))))
    return pooled.reshape((n_chunks * chunk, output_size, output_size, c))[:k]


def roi_align_level(feat, boxes, output_size: int, stride: float):
    '''ROIAlign of (K, 4) boxes (image coords) on a single (H, W, C) level.'''
    import math
    min_level = int(round(math.log2(stride))) if stride >= 1 else 0
    return multilevel_roi_align((feat,), boxes, output_size,
                                min_level=min_level,
                                chunk=min(128, max(boxes.shape[0], 1)))


def crop_resize_mask(mask: jnp.ndarray, box: jnp.ndarray, output_size: int):
    '''Bilinear crop of one (H, W) mask to a box at ``output_size`` square
    (ROIAlignV2 grid, sampling_ratio=1) — used for mask-loss targets.'''
    h, w = mask.shape
    frac = (jnp.arange(output_size, dtype=jnp.float32) + 0.5) / output_size
    xs = box[0] + (box[2] - box[0]) * frac - 0.5
    ys = box[1] + (box[3] - box[1]) * frac - 0.5
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    m = mask.astype(jnp.float32)
    v00 = m[y0[:, None], x0[None, :]]
    v01 = m[y0[:, None], x1[None, :]]
    v10 = m[y1[:, None], x0[None, :]]
    v11 = m[y1[:, None], x1[None, :]]
    top = v00 * (1 - fx)[None, :] + v01 * fx[None, :]
    bot = v10 * (1 - fx)[None, :] + v11 * fx[None, :]
    return top * (1 - fy)[:, None] + bot * fy[:, None]
