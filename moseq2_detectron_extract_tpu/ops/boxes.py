'''Box arithmetic: encode/decode deltas, IoU, clipping — all batched XLA.

Semantics follow the standard R-CNN Box2BoxTransform (xyxy boxes,
(dx, dy, dw, dh) deltas with per-coordinate weights) used by the reference's
Detectron2 stack.
'''
import math

import jax.numpy as jnp

_SCALE_CLAMP = math.log(1000.0 / 16)


def box_area(boxes):
    '''Area of (..., 4) xyxy boxes.'''
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def pairwise_iou(boxes1, boxes2):
    '''IoU matrix between (N, 4) and (M, 4) xyxy boxes -> (N, M).'''
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def encode_boxes(src_boxes, target_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    '''Deltas that transform ``src_boxes`` into ``target_boxes``.'''
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    eps = 1e-6
    dx = wx * (tgt_cx - src_cx) / jnp.maximum(src_w, eps)
    dy = wy * (tgt_cy - src_cy) / jnp.maximum(src_h, eps)
    dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / jnp.maximum(src_w, eps))
    dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / jnp.maximum(src_h, eps))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    '''Apply predicted deltas to anchor/proposal boxes.'''
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * widths
    cy = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)

    pred_cx = dx * widths + cx
    pred_cy = dy * heights + cy
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack([pred_cx - 0.5 * pred_w, pred_cy - 0.5 * pred_h,
                      pred_cx + 0.5 * pred_w, pred_cy + 0.5 * pred_h], axis=-1)


def clip_boxes(boxes, image_size):
    '''Clip xyxy boxes to [0, W] x [0, H]; image_size = (height, width).'''
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_boxes(boxes, threshold: float = 0.0):
    '''Mask of boxes with both sides > threshold.'''
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & \
        ((boxes[..., 3] - boxes[..., 1]) > threshold)
