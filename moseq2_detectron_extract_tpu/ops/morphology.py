'''Batched morphology + median filtering on device.

Replaces per-frame cv2.erode/dilate/morphologyEx/medianBlur loops
(m2de/proc/proc.py:480-515 ``clean_frames``) with XLA programs over whole
chunks: (N, H, W) in, (N, H, W) out, one fused launch per chunk.
'''
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_rect_strel(size: Tuple[int, int]) -> np.ndarray:
    '''Rectangular structuring element (all ones), size (w, h).'''
    return np.ones((size[1], size[0]), dtype=np.uint8)


def make_ellipse_strel(size: Tuple[int, int]) -> np.ndarray:
    '''Elliptical structuring element matching cv2.getStructuringElement(MORPH_ELLIPSE).

    Computed with cv2 when available so the pixel pattern matches exactly.
    '''
    try:
        import cv2
        return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, tuple(size))
    except ImportError:  # pragma: no cover
        w, h = size
        r, c = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = np.mgrid[0:h, 0:w]
        inside = ((yy - r) / max(r, 1e-9)) ** 2 + ((xx - c) / max(c, 1e-9)) ** 2 <= 1.0
        return inside.astype(np.uint8)


def select_strel(shape: str = 'e', size: Tuple[int, int] = (10, 10)) -> np.ndarray:
    '''Structuring element by shape code ('e'llipse or 'r'ect); parity with
    m2de/proc/util.py:9-26.'''
    if shape and shape[0].lower() == 'r':
        return make_rect_strel(size)
    return make_ellipse_strel(size)


def _strel_key(strel: np.ndarray):
    strel = np.asarray(strel) > 0
    return (strel.shape, tuple(np.flatnonzero(strel).tolist()))


@functools.lru_cache(maxsize=128)
def _build_morph_fn(key, op: str, iterations: int):
    (kh, kw), flat_idx = key
    ys, xs = np.unravel_index(np.array(flat_idx, dtype=np.int64), (kh, kw))
    # offsets relative to cv2 anchor (center at kh//2, kw//2)
    dys, dxs = ys - kh // 2, xs - kw // 2
    pad = max(kh, kw) - 1  # generous symmetric pad: valid for erosion & dilation

    @jax.jit
    def fn(frames):
        if jnp.issubdtype(frames.dtype, jnp.floating):
            neutral = jnp.inf if op == 'min' else -jnp.inf
        else:
            info = jnp.iinfo(frames.dtype)
            neutral = info.max if op == 'min' else info.min
        neutral = jnp.asarray(neutral, frames.dtype)

        def one_iter(x, _):
            padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), constant_values=neutral)
            if op == 'min':
                starts = [(int(dy + pad), int(dx + pad)) for dy, dx in zip(dys, dxs)]
            else:  # dilation reflects the strel about the anchor
                starts = [(int(pad - dy), int(pad - dx)) for dy, dx in zip(dys, dxs)]
            stacked = jnp.stack([padded[:, sy:sy + x.shape[1], sx:sx + x.shape[2]]
                                 for sy, sx in starts])
            reduce = jnp.min if op == 'min' else jnp.max
            return reduce(stacked, axis=0), None

        out, _ = jax.lax.scan(one_iter, frames, None, length=iterations)
        return out

    return fn


def erode(frames: jnp.ndarray, strel: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    '''Grayscale erosion of (N, H, W) frames; cv2 border semantics (border never wins).'''
    return _build_morph_fn(_strel_key(strel), 'min', iterations)(frames)


def dilate(frames: jnp.ndarray, strel: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    '''Grayscale dilation of (N, H, W) frames by a structuring element.'''
    return _build_morph_fn(_strel_key(strel), 'max', iterations)(frames)


def morph_open(frames: jnp.ndarray, strel: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    '''Opening: ``iterations`` erosions then ``iterations`` dilations
    (cv2.morphologyEx(MORPH_OPEN, iterations=n) semantics).'''
    return dilate(erode(frames, strel, iterations), strel, iterations)


@jax.jit
def median_blur_3x3(frames: jnp.ndarray) -> jnp.ndarray:
    '''3x3 median filter over (N, H, W) frames, replicate borders (cv2.medianBlur).'''
    padded = jnp.pad(frames, ((0, 0), (1, 1), (1, 1)), mode='edge')
    windows = jnp.stack([padded[:, dy:dy + frames.shape[1], dx:dx + frames.shape[2]]
                         for dy in range(3) for dx in range(3)])
    return jnp.sort(windows, axis=0)[4]


def median_blur(frames: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    '''k x k median filter (odd k), replicate borders.'''
    if ksize <= 1:
        return frames
    if ksize == 3:
        return median_blur_3x3(frames)
    return _build_median_fn(int(ksize))(frames)


@functools.lru_cache(maxsize=16)
def _build_median_fn(ksize: int):
    r = ksize // 2

    @jax.jit
    def fn(frames):
        padded = jnp.pad(frames, ((0, 0), (r, r), (r, r)), mode='edge')
        windows = jnp.stack([padded[:, dy:dy + frames.shape[1], dx:dx + frames.shape[2]]
                             for dy in range(ksize) for dx in range(ksize)])
        return jnp.sort(windows, axis=0)[(ksize * ksize) // 2]

    return fn


@functools.partial(jax.jit, static_argnames=('window',))
def temporal_median(frames: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    '''Median filter along the time axis (scipy.signal.medfilt [w,1,1] parity:
    zero-padded window at sequence edges).'''
    r = window // 2
    padded = jnp.pad(frames, ((r, r), (0, 0), (0, 0)), constant_values=0)
    windows = jnp.stack([padded[i:i + frames.shape[0]] for i in range(window)])
    return jnp.sort(windows, axis=0)[window // 2]
