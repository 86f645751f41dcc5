'''ROI heads: box classification/regression, mask head, keypoint head.

Architecture parity with the Detectron2 heads the reference configures
(m2de/model/config.py): FastRCNNConvFCHead (2 FC 1024), MaskRCNNConvUpsample
(4 conv 256 + deconv), KRCNNConvDeconvUpsample (8 conv 512 + deconv + 2x
bilinear upsample; pooler res 7 -> 28x28 heatmaps).
'''
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BoxHead(nn.Module):
    '''Flatten -> 2x FC(1024) -> class logits (C+1) + box deltas (C*4).

    ``dtype`` is the hidden compute dtype (AMP): the big FC matmuls run in
    it while the output projections keep flax's promote-to-f32 default, so
    scores/deltas leave in f32.
    '''
    num_classes: int = 1
    fc_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name='fc1')(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name='fc2')(x))
        cls_logits = nn.Dense(self.num_classes + 1, name='cls_score')(x)
        box_deltas = nn.Dense(self.num_classes * 4, name='bbox_pred')(x)
        return cls_logits, box_deltas


class MaskHead(nn.Module):
    '''4x conv(256) -> deconv 2x -> 1x1 conv -> per-class mask logits.'''
    num_classes: int = 1
    conv_dims: Tuple[int, ...] = (256, 256, 256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, dim in enumerate(self.conv_dims):
            x = nn.relu(nn.Conv(dim, (3, 3), padding=1, dtype=self.dtype,
                                name=f'mask_fcn{i + 1}')(x))
        x = nn.relu(nn.ConvTranspose(self.conv_dims[-1], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name='deconv')(x))
        # final 1x1 keeps the promote-to-f32 default: mask logits leave f32
        return nn.Conv(self.num_classes, (1, 1), name='predictor')(x)


class KeypointHead(nn.Module):
    '''8x conv(512) -> deconv 2x -> bilinear 2x -> K heatmap logits.'''
    num_keypoints: int = 8
    conv_dims: Tuple[int, ...] = (512,) * 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, dim in enumerate(self.conv_dims):
            x = nn.relu(nn.Conv(dim, (3, 3), padding=1, dtype=self.dtype,
                                name=f'conv_fcn{i + 1}')(x))
        # final deconv keeps the promote-to-f32 default: the heatmap argmax/
        # interpolation downstream wants f32 resolution
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             name='score_lowres')(x)
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method='bilinear')
        return x  # (N, 4*pooler, 4*pooler, K)


def heatmaps_to_keypoints(heatmaps: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    '''Decode (D, S, S, K) heatmap logits at (D, 4) boxes -> (D, K, 3 [x, y, score]).

    Follows the intent of D2's heatmaps_to_keypoints: the argmax bin maps to
    its center within the box; score is the softmax probability at the argmax.
    '''
    d, s, _, k = heatmaps.shape
    hm = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(d, k, s * s)
    probs = jax.nn.softmax(hm.astype(jnp.float32), axis=-1)
    flat_idx = jnp.argmax(hm, axis=-1)
    score = jnp.take_along_axis(probs, flat_idx[..., None], axis=-1)[..., 0]
    yi = (flat_idx // s).astype(jnp.float32)
    xi = (flat_idx % s).astype(jnp.float32)

    x1, y1 = boxes[:, 0], boxes[:, 1]
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-3)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-3)
    xs = x1[:, None] + (xi + 0.5) * (w[:, None] / s)
    ys = y1[:, None] + (yi + 0.5) * (h[:, None] / s)
    return jnp.stack([xs, ys, score], axis=-1)


def keypoint_targets(keypoints: jnp.ndarray, boxes: jnp.ndarray,
                     heatmap_size: int):
    '''Discretize gt keypoints (R, K, 3 [x, y, vis]) into per-roi heatmap bins.

    Returns (target_idx (R, K) int, valid (R, K) bool). A keypoint is valid if
    visible (v > 0) and inside its roi (D2 keypoints_to_heatmap semantics).
    '''
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = jnp.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-3)
    h = jnp.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-3)
    sx = heatmap_size / w
    sy = heatmap_size / h
    x = (keypoints[..., 0] - x1) * sx
    y = (keypoints[..., 1] - y1) * sy
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    inside = (x >= 0) & (x < heatmap_size) & (y >= 0) & (y < heatmap_size)
    valid = inside & (keypoints[..., 2] > 0)
    xi = jnp.clip(xi, 0, heatmap_size - 1)
    yi = jnp.clip(yi, 0, heatmap_size - 1)
    return yi * heatmap_size + xi, valid


def paste_masks(mask_logits: jnp.ndarray, boxes: jnp.ndarray,
                image_size: Tuple[int, int], threshold: float = 0.5) -> jnp.ndarray:
    '''Paste (D, 28, 28) mask probabilities into full-image boolean masks.

    Bilinear inverse of ROI cropping (D2 paste_masks_in_image semantics with
    half-pixel alignment). Returns (D, H, W) bool.

    Bilinear interpolation is separable, so the paste is computed as two
    small matmuls per detection — ``Wy @ mask @ Wx`` with triangle-kernel
    weight matrices ``Wy (H, s)`` / ``Wx (s, W)`` — instead of four
    per-pixel dynamic gathers over the canvas. The gather formulation was
    measured at 170 ms of the 237 ms production inference batch on a v5e
    (72% of the whole program); the matmul form maps onto the MXU exactly
    like the Pallas separable ROIAlign (ops/pallas_roi_align.py).
    ``relu(1 - |m - i|)`` reproduces the zero-padded bilinear taps exactly,
    including the partial edge weights for mask coords in (-1, 0) and
    (s-1, s).
    '''
    d, s, _ = mask_logits.shape[:3]
    h, w = image_size
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0) + 0.5   # pixel centers
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1) + 0.5
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, s), 1)        # mask grid

    def one(mask, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        # map image pixel centers into mask grid coords
        my = (ys - y1) / bh * s - 0.5                              # (H, 1)
        mx = (xs - x1) / bw * s - 0.5                              # (1, W)
        wy = jnp.maximum(1.0 - jnp.abs(my - idx), 0.0)             # (H, s)
        wx = jnp.maximum(1.0 - jnp.abs(mx.T - idx), 0.0)           # (W, s)
        v = wy @ mask @ wx.T                                       # (H, W)
        yin = (ys[:, 0] >= y1) & (ys[:, 0] <= y2 + 1)
        xin = (xs[0] >= x1) & (xs[0] <= x2 + 1)
        return (v >= threshold) & yin[:, None] & xin[None, :]

    return jax.vmap(one)(jax.nn.sigmoid(mask_logits.astype(jnp.float32)), boxes)
