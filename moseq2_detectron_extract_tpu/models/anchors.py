'''Static multi-level anchor generation (Detectron2 DefaultAnchorGenerator
semantics: cell anchors centered on stride/2 offsets... actually offset 0.0,
centers at (x + 0.5) * stride? D2 uses offset=0.0 -> centers at x*stride +
stride* 0.5*0 = grid points * stride; see _create_grid_offsets).

We follow D2: grid offsets are (arange(W) + 0.0) * stride and cell anchors are
centered at 0, i.e. anchor centers sit on (x*stride, y*stride).
'''
import functools
from typing import List, Sequence, Tuple

import numpy as np


@functools.lru_cache(maxsize=32)
def _cell_anchors(sizes: Tuple[float, ...], aspect_ratios: Tuple[float, ...]) -> np.ndarray:
    anchors = []
    for size in sizes:
        area = size ** 2
        for ar in aspect_ratios:
            w = np.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.array(anchors, dtype=np.float32)


@functools.lru_cache(maxsize=32)
def generate_anchors(feature_shapes: Tuple[Tuple[int, int], ...],
                     strides: Tuple[int, ...],
                     sizes: Tuple[Tuple[float, ...], ...],
                     aspect_ratios: Tuple[float, ...]) -> Tuple[np.ndarray, ...]:
    '''Anchor boxes per level; level l returns (H_l * W_l * A, 4) xyxy.'''
    out = []
    for (h, w), stride, level_sizes in zip(feature_shapes, strides, sizes):
        cell = _cell_anchors(tuple(level_sizes), tuple(aspect_ratios))  # (A, 4)
        shift_x = np.arange(w, dtype=np.float32) * stride
        shift_y = np.arange(h, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return tuple(out)
