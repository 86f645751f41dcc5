'''Visualization: fast cv2 drawing, raw-session previews, h5 result re-render.

Parity target: m2de/viz.py (fast instance/keypoint drawing :132-294, raw
preview :350-394, h5 result preview with reverse crop-rotate reconstruction
:394-517, composited views :524-620). The reverse crop-rotate runs batched on
device (ops/warp.py).
'''
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from moseq2_detectron_extract_tpu.io.session import Session, Stream
from moseq2_detectron_extract_tpu.io.video import PreviewVideoWriter, apply_colormap_jet
from moseq2_detectron_extract_tpu.ops.preprocess import prep_raw_frames
from moseq2_detectron_extract_tpu.ops.warp import reverse_crop_and_rotate_frames
from moseq2_detectron_extract_tpu.proc.keypoints import (default_keypoint_colors,
                                                         default_keypoint_connection_rules,
                                                         default_keypoint_names)

try:
    import cv2
    HAS_CV2 = True
except ImportError:  # pragma: no cover
    HAS_CV2 = False


# ---------------------------------------------------------------------------
# video composition (m2de/proc/proc.py:20-126)
# ---------------------------------------------------------------------------

def colorize_video(frames: np.ndarray, vmin: float = 0, vmax: float = 100,
                   cmap: str = 'jet') -> np.ndarray:
    '''Colorize single-channel video (N, H, W) -> uint8 RGB (N, H, W, 3).'''
    del cmap  # only the jet-style map is supported without matplotlib
    return apply_colormap_jet(np.asarray(frames), vmin, vmax)


def stack_videos(videos, orientation: str = 'horizontal',
                 out: Optional[np.ndarray] = None) -> np.ndarray:
    '''Stack equal-length RGB videos into one composite
    (m2de/proc/proc.py:20-62). orientation: horizontal|vertical|diagional.

    ``out`` reuses a caller-held buffer (fresh-page allocation is the
    preview's hottest cost on a 1-core host). Padding regions are zeroed
    explicitly each call — cheap memset over warm pages — so a reused
    buffer may carry arbitrary garbage (e.g. frame-number stamps the
    preview writer draws into the composite's padding corner).'''
    videos = [np.asarray(v) for v in videos]
    nframes = videos[0].shape[0]
    channels = videos[0].shape[3]
    if any(v.shape[0] != nframes or v.shape[3] != channels for v in videos):
        raise ValueError('videos must share frame count and channel count')
    heights = [v.shape[1] for v in videos]
    widths = [v.shape[2] for v in videos]

    if orientation == 'horizontal':
        height, width = max(heights), sum(widths)
    elif orientation == 'vertical':
        height, width = sum(heights), max(widths)
    elif orientation == 'diagional':
        height, width = sum(heights), sum(widths)
    else:
        raise ValueError(f'Unknown orientation "{orientation}"')

    reused = out is not None
    if reused:
        expect = (nframes, height, width, channels)
        if out.shape != expect or out.dtype != videos[0].dtype:
            raise ValueError(f'out must be {expect} {videos[0].dtype}, '
                             f'got {out.shape} {out.dtype}')
    else:
        out = np.zeros((nframes, height, width, channels), videos[0].dtype)
    off_h = off_w = 0
    for v in videos:
        if orientation == 'horizontal':
            out[:, :v.shape[1], off_w:off_w + v.shape[2]] = v
            if reused and v.shape[1] < height:
                out[:, v.shape[1]:, off_w:off_w + v.shape[2]] = 0
            off_w += v.shape[2]
        elif orientation == 'vertical':
            out[:, off_h:off_h + v.shape[1], :v.shape[2]] = v
            if reused and v.shape[2] < width:
                out[:, off_h:off_h + v.shape[1], v.shape[2]:] = 0
            off_h += v.shape[1]
        else:
            if reused:
                out[:, off_h:off_h + v.shape[1], :off_w] = 0
                out[:, off_h:off_h + v.shape[1], off_w + v.shape[2]:] = 0
            out[:, off_h:off_h + v.shape[1], off_w:off_w + v.shape[2]] = v
            off_h += v.shape[1]
            off_w += v.shape[2]
    return out


# ---------------------------------------------------------------------------
# fast drawing (m2de/viz.py:132-294)
# ---------------------------------------------------------------------------

_DEFAULT_NAME_TO_IDX = {n: i for i, n in enumerate(default_keypoint_names)}


def _chan(color, order: str):
    '''Reverse a draw color for BGR-native rendering.'''
    return tuple(color[::-1]) if order == 'bgr' else tuple(color)


def draw_keypoints(image: np.ndarray, keypoints: np.ndarray,
                   names: Optional[Sequence[str]] = None,
                   draw_skeleton: bool = True, order: str = 'rgb') -> np.ndarray:
    '''Draw keypoint dots + skeleton onto a uint8 color image in place
    (``order`` names the image's channel order so colors land correctly).'''
    if not HAS_CV2:
        return image
    if names is None:  # called once per frame: avoid rebuilding the map
        name_to_idx = _DEFAULT_NAME_TO_IDX
    else:
        name_to_idx = {n: i for i, n in enumerate(names)}
    for ki, (x, y, *rest) in enumerate(np.atleast_2d(keypoints)):
        if not (np.isfinite(x) and np.isfinite(y)):
            continue
        color = _chan(default_keypoint_colors[ki % len(default_keypoint_colors)],
                      order)
        cv2.circle(image, (int(round(x)), int(round(y))), 2, color, -1, cv2.LINE_AA)
    if draw_skeleton:
        for a, b, color in default_keypoint_connection_rules:
            if a not in name_to_idx or b not in name_to_idx:
                continue
            pa = keypoints[name_to_idx[a]]
            pb = keypoints[name_to_idx[b]]
            if np.isfinite(pa[:2]).all() and np.isfinite(pb[:2]).all():
                cv2.line(image, (int(round(pa[0])), int(round(pa[1]))),
                         (int(round(pb[0])), int(round(pb[1]))), _chan(color, order),
                         1, cv2.LINE_AA)
    return image


_SKELETON_IDX = None  # [(ia, ib, color)] resolved once for the default names


def _skeleton_idx():
    global _SKELETON_IDX
    if _SKELETON_IDX is None:
        _SKELETON_IDX = [
            (_DEFAULT_NAME_TO_IDX[a], _DEFAULT_NAME_TO_IDX[b], color)
            for a, b, color in default_keypoint_connection_rules
            if a in _DEFAULT_NAME_TO_IDX and b in _DEFAULT_NAME_TO_IDX]
    return _SKELETON_IDX


def precompute_keypoint_draws(keypoints: np.ndarray, order: str = 'rgb'):
    '''Block-level prep for :func:`draw_keypoints_fast`: one vectorized
    round/validity pass over (N, K, 2+) keypoints instead of per-frame
    numpy scalar math (the per-frame ``round``/``isfinite`` calls were
    ~40%% of the preview keypoint-draw cost). Returns (pts, fin, colors,
    skeleton) with pts/fin plain nested python lists.'''
    kp = np.asarray(keypoints)
    xy = kp[..., :2].astype(np.float64)
    fin = np.isfinite(xy).all(axis=-1)
    pts = np.round(np.nan_to_num(xy)).astype(np.int32).tolist()
    colors = [_chan(default_keypoint_colors[ki % len(default_keypoint_colors)],
                    order) for ki in range(kp.shape[1])]
    skeleton = [(ia, ib, _chan(c, order)) for ia, ib, c in _skeleton_idx()]
    return pts, fin.tolist(), colors, skeleton


def draw_keypoints_fast(image: np.ndarray, pts, fin, colors, skeleton,
                        draw_skeleton: bool = True) -> np.ndarray:
    '''Per-frame half of the block-precomputed keypoint draw: identical
    output to :func:`draw_keypoints` with default names (circles r=2 AA +
    skeleton AA lines), minus the per-frame scalar overhead.'''
    if not HAS_CV2:
        return image
    for ki, ok in enumerate(fin):
        if ok:
            cv2.circle(image, tuple(pts[ki]), 2, colors[ki], -1, cv2.LINE_AA)
    if draw_skeleton:
        for ia, ib, color in skeleton:
            if fin[ia] and fin[ib]:
                cv2.line(image, tuple(pts[ia]), tuple(pts[ib]), color, 1,
                         cv2.LINE_AA)
    return image


def draw_mask_contour(image: np.ndarray, mask: np.ndarray,
                      color=(255, 255, 255)) -> np.ndarray:
    '''Outline a boolean mask on an RGB image in place.'''
    if not HAS_CV2:
        return image
    contours, _ = cv2.findContours(np.asarray(mask, np.uint8), cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    cv2.drawContours(image, contours, -1, color, 1, cv2.LINE_AA)
    return image


def draw_instances(image: np.ndarray, masks: np.ndarray, keypoints: np.ndarray,
                   scores: Optional[np.ndarray] = None) -> np.ndarray:
    '''Fast multi-instance rendering (mask outlines + keypoints + scores).'''
    for d in range(len(masks)):
        draw_mask_contour(image, masks[d])
        draw_keypoints(image, keypoints[d])
        if scores is not None and HAS_CV2:
            ys, xs = np.nonzero(masks[d])
            if len(ys):
                cv2.putText(image, f'{scores[d]:.2f}', (int(xs.min()), int(ys.min())),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35, (255, 255, 255), 1)
    return image


def draw_annotation_item(item: Dict) -> np.ndarray:
    '''Render one annotated dataset item: image + GT masks/keypoints/boxes.

    Returns an RGB uint8 array. Segmentations may be boolean masks or
    Label-Studio polygon lists (m2de DataItem shape).
    '''
    from moseq2_detectron_extract_tpu.io.annot import poly_to_mask
    from moseq2_detectron_extract_tpu.io.image import read_image

    image = np.atleast_3d(read_image(item['file_name']))[:, :, 0]
    scale_factor = item.get('rescale_intensity') or 1
    image = np.clip(image.astype('float32') * scale_factor, 0, 255)
    rgb = _gray_chunk_to_rgb(image.astype('uint8')[None])[0]
    h, w = rgb.shape[:2]
    for annot in item.get('annotations', []):
        seg = annot.get('segmentation')
        if seg is not None:
            if isinstance(seg, np.ndarray) and seg.dtype != object:
                mask = np.atleast_3d(seg)[:, :, 0].astype(bool)
            else:
                poly = np.reshape(np.asarray(seg[0], float), (-1, 2))
                mask = poly_to_mask(poly, (h, w))[..., 0].astype(bool)
            _blend_mask(rgb, mask, color=(0, 120, 255), alpha=0.35)
            draw_mask_contour(rgb, mask, color=(0, 200, 255))
        kp = np.asarray(annot.get('keypoints', []), float).reshape(-1, 3)
        if kp.size:
            draw_keypoints(rgb, kp[:, :2])
        box = annot.get('bbox')
        if box is not None and HAS_CV2:
            x0, y0, x1, y1 = [int(round(v)) for v in box]
            cv2.rectangle(rgb, (x0, y0), (x1, y1), (0, 255, 0), 1)
    return rgb


def visualize_annotations(annotations: Sequence[Dict], num: int = 5,
                          seed: Optional[int] = None):
    '''Visualize annotated segmentation masks and keypoints on a sampled
    subset of items (m2de/viz.py:29-51 analog; drawing is our cv2 overlay
    stack instead of detectron2's Visualizer).

    Returns (fig, axs) when matplotlib is importable, else a horizontally
    stacked RGB array of the rendered items.
    '''
    import random as _random
    rng = _random.Random(seed)
    num = min(num, len(annotations))
    sampled = rng.sample(list(annotations), num)
    rendered = [draw_annotation_item(item) for item in sampled]
    try:
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return stack_videos([r[None] for r in rendered],
                            orientation='horizontal')[0]
    fig, axs = plt.subplots(1, num, figsize=(4 * num, 4), squeeze=False)
    for image, ax in zip(rendered, axs[0]):
        ax.imshow(image)
        ax.axis('off')
    return fig, axs[0]


def visualize_inference(frame: np.ndarray, prediction: Dict[str, np.ndarray],
                        min_height: float, max_height: float,
                        scale: float = 2.0) -> np.ndarray:
    '''Visualize a prediction dict over a raw depth frame
    (m2de/viz.py:54-73 analog).

    ``frame`` is (H, W) depth in mm; ``prediction`` is a Predictor-style
    dict (masks (D, H, W), keypoints (D, K, 3), scores (D,), valid (D,)).
    The frame is normalized by [min_height, max_height], instances are drawn
    (mask outline + keypoints + score), and the result is geometrically
    scaled by ``scale``. Returns RGB uint8.
    '''
    norm = (np.asarray(frame, 'float32') - min_height) / \
        max(max_height - min_height, 1e-9)
    gray = (np.clip(norm, 0, 1) * 255).astype('uint8')
    rgb = _gray_chunk_to_rgb(gray[None])[0]
    valid = np.asarray(prediction.get(
        'valid', np.ones(len(prediction['masks']), bool)), bool)
    masks = np.asarray(prediction['masks'])[valid]
    keypoints = np.asarray(prediction['keypoints'])[valid]
    scores = prediction.get('scores')
    scores = np.asarray(scores)[valid] if scores is not None else None
    draw_instances(rgb, masks, keypoints, scores)
    if scale != 1.0 and HAS_CV2:
        rgb = cv2.resize(rgb, (int(rgb.shape[1] * scale),
                               int(rgb.shape[0] * scale)),
                         interpolation=cv2.INTER_LINEAR)
    return rgb


# ---------------------------------------------------------------------------
# composited views (m2de/viz.py:524-620)
# ---------------------------------------------------------------------------

def _gray_chunk_to_rgb(frames: np.ndarray,
                       out: Optional[np.ndarray] = None) -> np.ndarray:
    '''(N, H, W) uint8 -> (N, H, W, 3) RGB in one SIMD pass.

    ``out`` reuses a persistent buffer: a fresh (N, H, W, 3) allocation per
    block is ~60 MB of cold pages, and kernel page-zeroing dominated the
    whole arena render (7 s / 1000 frames measured) on the 1-core host.'''
    frames = np.ascontiguousarray(frames)
    n, h, w = frames.shape
    if out is None:
        out = np.empty((n, h, w, 3), np.uint8)
    if HAS_CV2:
        cv2.cvtColor(frames.reshape(n * h, w), cv2.COLOR_GRAY2RGB,
                     dst=out.reshape(n * h, w, 3))
    else:
        out[...] = frames[..., None]
    return out


_BLEND_LUTS: dict = {}


def _blend_mask(image: np.ndarray, mask: np.ndarray, color=(0, 0, 255),
                alpha: float = 0.3) -> None:
    '''Alpha-fill ``mask`` onto ``image`` in place (m2de/viz.py:draw_mask),
    touching only the mask's bounding box for speed.

    The bbox comes from row/col ``any`` reductions rather than ``np.nonzero``
    — nonzero materializes index arrays for every set pixel and was the
    preview render's single hottest line (0.56 ms/frame at the 412px arena).
    '''
    rows = mask.any(axis=1)
    if not rows.any():
        return
    cols = mask.any(axis=0)
    y0 = int(np.argmax(rows))
    y1 = len(rows) - int(np.argmax(rows[::-1]))
    x0 = int(np.argmax(cols))
    x1 = len(cols) - int(np.argmax(cols[::-1]))
    region = image[y0:y1, x0:x1]
    sub = mask[y0:y1, x0:x1] > 0
    # LUT per (color, alpha): v -> uint8(v*(1-alpha) + c*alpha) per channel,
    # then a masked copy — no per-pixel float math or fancy-index scatter
    # (same truncation as the old astype('uint8') expression, bit-identical)
    key = (tuple(color), float(alpha))
    lut = _BLEND_LUTS.get(key)
    if lut is None:
        v = np.arange(256, dtype='float32')
        lut = np.stack([(v * (1 - alpha) + c * alpha).astype('uint8')
                        for c in color], axis=0)  # (3, 256)
        _BLEND_LUTS[key] = lut
    blended = np.empty_like(region)
    for ch in range(region.shape[-1]):
        blended[..., ch] = lut[ch][region[..., ch]]
    np.copyto(region, blended, where=sub[..., None])


class ArenaView:
    '''Arena depth image + ROI contour + instance overlays (mask fill, box,
    keypoints/skeleton) — m2de/viz.py:533-573 (reference scale default 2.0;
    ours defaults to 1.0: upscaling is cosmetic and the encode cost is the
    preview bottleneck on weak hosts).'''

    def __init__(self, roi: Optional[np.ndarray], vmin: float = 0,
                 vmax: float = 100, scale: float = 1.0, order: str = 'rgb'):
        self.vmin = vmin
        self.vmax = vmax
        self.scale = scale
        self.order = order
        self.contours = None
        self._stamp = None  # cached (shape, ys, xs, alpha) contour overlay
        if roi is not None and HAS_CV2:
            ys, xs = np.nonzero(np.asarray(roi) > 0)
            cropped = np.asarray(roi)[ys.min():ys.max() + 1, xs.min():xs.max() + 1] \
                if len(ys) else np.asarray(roi)
            self.contours, _ = cv2.findContours(
                (cropped > 0).astype('uint8'), cv2.RETR_EXTERNAL,
                cv2.CHAIN_APPROX_SIMPLE)

    def render(self, frames: np.ndarray, masks: Optional[np.ndarray] = None,
               keypoints: Optional[np.ndarray] = None,
               boxes: Optional[np.ndarray] = None,
               out: Optional[np.ndarray] = None,
               mask_crops: Optional[np.ndarray] = None,
               mask_origins: Optional[np.ndarray] = None) -> np.ndarray:
        '''frames (N, H, W) uint8 already intensity-scaled; masks (N, H, W)
        cropped-or-full instance masks; keypoints (N, K, 3) arena px;
        boxes (N, B, 4) arena px (NaN rows skipped). ``out`` (only honored
        at scale 1.0) reuses a persistent (N, H, W, 3) uint8 buffer.

        ``mask_crops`` (N, c, c) + ``mask_origins`` (N, 2 [y0, x0]) blend
        the overlay from window crops without materializing full-frame
        masks (the extraction pipeline path, ops/instances.py
        pack_masks_cropped); equivalent to ``masks`` scattered at the
        origins. Ignored when ``masks`` is given.'''
        video = _gray_chunk_to_rgb(
            frames, out=out if self.scale == 1.0 else None)
        if self.scale != 1.0 and HAS_CV2:
            n, h, w = frames.shape
            sh, sw = int(h * self.scale), int(w * self.scale)
            video = np.stack([cv2.resize(video[i], (sw, sh)) for i in range(n)])
        s = self.scale
        if self.contours is not None:
            # the ROI outline is static: rasterize it ONCE (AA coverage on a
            # black canvas -> per-pixel alpha) and composite the whole block
            # in one vector pass — per-frame cv2.drawContours(LINE_AA) was
            # the arena render's hottest call (0.74 s / 1000 frames)
            ys, xs, alpha = self._contour_stamp(video.shape[1], video.shape[2])
            px = video[:, ys, xs].astype(np.float32)
            px += alpha * (np.array((0, 255, 0), np.float32) - px)
            video[:, ys, xs] = (px + 0.5).astype(np.uint8)
        mask_color = _chan((0, 0, 255), self.order)
        kp_draw = None
        if keypoints is not None:
            kp_draw = precompute_keypoint_draws(
                np.asarray(keypoints) * [s, s, 1], order=self.order)
        box_pts = box_ok = None
        if boxes is not None and HAS_CV2:
            bx = np.asarray(boxes, np.float64)
            if bx.ndim == 2:  # (N, 4) -> one box per frame
                bx = bx[:, None, :]
            bx = bx * s
            box_ok = ~np.isnan(bx).any(axis=-1)
            box_pts = np.nan_to_num(bx).astype(np.int32).tolist()
        use_crops = masks is None and mask_crops is not None
        if use_crops and s != 1.0:
            # window blending assumes unscaled geometry; reconstruct rarely
            h, w = frames.shape[1], frames.shape[2]
            full = np.zeros((len(mask_crops), h, w), np.uint8)
            c = mask_crops.shape[1]
            for i, (y0, x0) in enumerate(np.asarray(mask_origins)):
                full[i, y0:y0 + c, x0:x0 + c] = mask_crops[i]
            masks, use_crops = full, False
        for i in range(video.shape[0]):
            im = video[i]
            if use_crops:
                y0, x0 = mask_origins[i]
                c = mask_crops.shape[1]
                _blend_mask(im[y0:y0 + c, x0:x0 + c], mask_crops[i],
                            color=mask_color)
            elif masks is not None:
                _blend_mask(im, masks[i], color=mask_color)
            if box_pts is not None:
                for b, box in enumerate(box_pts[i]):
                    if not box_ok[i][b]:
                        continue
                    cv2.rectangle(im, (box[0], box[1]), (box[2], box[3]),
                                  (0, 255, 0))
                    cv2.putText(im, str(b), (box[0], box[1]),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 255, 255), 1,
                                cv2.LINE_AA)
            if kp_draw is not None:
                draw_keypoints_fast(im, kp_draw[0][i], kp_draw[1][i],
                                    kp_draw[2], kp_draw[3])
        return video

    def _contour_stamp(self, h: int, w: int):
        '''(ys, xs, alpha) of the scaled ROI contour, rasterized once with
        the same cv2 AA line as the old per-frame draw (white on black, so
        pixel intensity IS the AA coverage).'''
        if self._stamp is None or self._stamp[0] != (h, w):
            canvas = np.zeros((h, w), np.uint8)
            cv2.drawContours(canvas, [np.round(c * self.scale).astype(np.int32)
                                      for c in self.contours], -1, 255, 1,
                             cv2.LINE_AA)
            ys, xs = np.nonzero(canvas)
            alpha = (canvas[ys, xs].astype(np.float32) / 255.0)[:, None]
            self._stamp = ((h, w), ys, xs, alpha)
        return self._stamp[1], self._stamp[2], self._stamp[3]


class RotatedKeypointsView:
    '''Cropped/rotated mask + rotated keypoints about the crop center
    (m2de/viz.py:576-610).'''

    def __init__(self, scale: float = 1.5, order: str = 'rgb'):
        self.scale = scale
        self.order = order

    def render(self, masks: np.ndarray, rot_keypoints: np.ndarray,
               out: Optional[np.ndarray] = None) -> np.ndarray:
        '''masks (N, h, w) uint8/bool crops; rot_keypoints (N, K, 2+) px
        relative to the crop center. ``out`` reuses a persistent
        (N, sh, sw, 3) uint8 buffer (memset beats cold-page allocation).'''
        n, h, w = masks.shape
        sh, sw = int(h * self.scale), int(w * self.scale)
        if out is not None and out.shape == (n, sh, sw, 3):
            video = out
            video.fill(0)
        else:
            video = np.zeros((n, sh, sw, 3), dtype='uint8')
        origin = np.array([sw // 2, sh // 2], 'float64')
        masks = np.asarray(masks, 'uint8')
        if self.scale != 1.0:
            # batched INTER_NEAREST: one gather for the whole block with
            # cv2's index rule (sx = floor(dx * src/dst)) instead of a
            # per-frame cv2.resize call
            iy = np.minimum((np.arange(sh) * (h / sh)).astype(np.intp), h - 1)
            ix = np.minimum((np.arange(sw) * (w / sw)).astype(np.intp), w - 1)
            masks = masks[:, iy[:, None], ix[None, :]]
        kpts_all = np.asarray(rot_keypoints, 'float64').copy()
        kpts_all[:, :, :2] = kpts_all[:, :, :2] * self.scale + origin
        mask_color = _chan((0, 0, 255), self.order)
        pts, fin, colors, skeleton = precompute_keypoint_draws(
            kpts_all, order=self.order)
        for i in range(n):
            _blend_mask(video[i], masks[i], alpha=0.7, color=mask_color)
            draw_keypoints_fast(video[i], pts[i], fin[i], colors, skeleton)
        return video


class CleanedFramesView:
    '''Jet-colorized masked cleaned crops (m2de/viz.py:612-620).'''

    def __init__(self, vmin: float = 0, vmax: float = 100, scale: float = 1.5,
                 order: str = 'rgb'):
        self.vmin = vmin
        self.vmax = vmax
        self.scale = scale
        self.order = order

    def render(self, clean_frames: np.ndarray, masks: np.ndarray,
               out: Optional[np.ndarray] = None) -> np.ndarray:
        '''``out`` reuses a persistent (N, h*scale, w*scale, 3) uint8
        buffer for the (scaled) output.'''
        video = apply_colormap_jet(
            np.asarray(clean_frames) * (np.asarray(masks) > 0),
            self.vmin, self.vmax,
            out=out if self.scale == 1.0 else None, order=self.order)
        if self.scale != 1.0 and HAS_CV2:
            n, h, w = video.shape[:3]
            sh, sw = int(h * self.scale), int(w * self.scale)
            if out is not None and out.shape == (n, sh, sw, 3):
                scaled = out
            else:
                scaled = np.empty((n, sh, sw, 3), np.uint8)
            for i in range(n):
                cv2.resize(video[i], (sw, sh), dst=scaled[i])
            video = scaled
        return video


# ---------------------------------------------------------------------------
# raw session preview (m2de/viz.py:350-394, cli.py:220-276)
# ---------------------------------------------------------------------------

def generate_raw_preview(input_file: str, output_file: Optional[str] = None,
                         min_height: float = 0, max_height: float = 100,
                         chunk_size: int = 1000, fps: int = 30,
                         bg_roi_depth_range: Tuple[float, float] = (650, 750)) -> str:
    '''Render a background-subtracted preview movie of a raw session.'''
    session = Session(input_file)
    session.find_roi(bg_roi_depth_range=bg_roi_depth_range)
    if output_file is None:
        output_file = os.path.join(session.dirname, 'preview.mp4')

    writer = PreviewVideoWriter(output_file, fps=fps, vmin=min_height,
                                vmax=max_height)
    iterator = session.iterate(chunk_size=chunk_size)
    iterator.attach_filter(Stream.DEPTH, lambda f: np.asarray(prep_raw_frames(
        f, bground_im=session.bground_im, roi=session.roi,
        vmin=min_height, vmax=max_height, dtype='uint8')))
    for frame_idxs, chunk in iterator:
        writer.write_frames(np.asarray(frame_idxs), np.asarray(chunk))
    writer.close()
    return output_file


# ---------------------------------------------------------------------------
# result h5 preview (m2de/viz.py:394-620)
# ---------------------------------------------------------------------------

class H5ResultPreviewVideoGenerator:
    '''Re-render the 3-panel preview from a results h5: reconstructed arena
    view (reverse crop-rotate, on device), rotated-keypoints crop view, and
    cleaned-frames view.'''

    def __init__(self, result_file: str, output_file: Optional[str] = None,
                 vmin: float = 0, vmax: float = 100, chunk_size: int = 1000,
                 fps: int = 30):
        self.result_file = result_file
        self.output_file = output_file or os.path.splitext(result_file)[0] + '.preview.mp4'
        self.vmin = vmin
        self.vmax = vmax
        self.chunk_size = chunk_size
        self.fps = fps

    def generate(self) -> str:
        '''Render the preview video.'''
        import jax.numpy as jnp

        with h5py.File(self.result_file, 'r') as h5:
            nframes = h5['frames'].shape[0]
            roi = h5['metadata/extraction/roi'][()]
            ys, xs = np.nonzero(roi > 0)
            if len(ys):
                dest_h = int(ys.max() - ys.min())
                dest_w = int(xs.max() - xs.min())
            else:
                dest_h, dest_w = roi.shape

            writer = PreviewVideoWriter(self.output_file, fps=self.fps,
                                        vmin=self.vmin, vmax=self.vmax)
            kp_names = default_keypoint_names
            for start in range(0, nframes, self.chunk_size):
                stop = min(start + self.chunk_size, nframes)
                frames = h5['frames'][start:stop]
                centroid = np.stack([h5['scalars/centroid_x_px'][start:stop],
                                     h5['scalars/centroid_y_px'][start:stop]], axis=1)
                angles = np.rad2deg(h5['scalars/angle'][start:stop])
                rot_kpts = np.stack(
                    [np.stack([h5[f'keypoints/rotated/{n}_x_px'][start:stop],
                               h5[f'keypoints/rotated/{n}_y_px'][start:stop]], axis=1)
                     for n in kp_names], axis=1)

                arena = np.asarray(reverse_crop_and_rotate_frames(
                    jnp.asarray(frames.astype('float32')), jnp.asarray(centroid),
                    jnp.asarray(angles), (dest_w, dest_h)))

                arena_rgb = apply_colormap_jet(arena, self.vmin, self.vmax)
                crop_rgb = apply_colormap_jet(frames, self.vmin, self.vmax)

                ch, cw = frames.shape[1:3]
                composite = np.zeros((frames.shape[0], max(dest_h, ch * 2),
                                      dest_w + cw, 3), dtype='uint8')
                composite[:, :dest_h, :dest_w] = arena_rgb
                for i in range(frames.shape[0]):
                    panel = crop_rgb[i].copy()
                    kpts = rot_kpts[i] + np.array([cw / 2, ch / 2])
                    draw_keypoints(panel, np.concatenate(
                        [kpts, np.ones((len(kpts), 1))], axis=1))
                    composite[i, :ch, dest_w:dest_w + cw] = panel
                    composite[i, ch:ch * 2, dest_w:dest_w + cw] = crop_rgb[i]
                writer.write_frames(np.arange(start, stop), composite)
            writer.close()
        logging.info('Wrote %s', self.output_file)
        return self.output_file
