'''ROI discovery: RANSAC plane fit (device) + blob ranking (host).

Parity target: m2de/proc/roi.py. The 1000-hypothesis plane RANSAC runs as a
single jitted program (ops/ransac.py); candidate-region labeling/ranking
happens once per session on host with scipy (it is off the hot path).
'''
from typing import Optional, Tuple

import numpy as np
import scipy.ndimage
import scipy.stats

from moseq2_detectron_extract_tpu.ops.morphology import (dilate, erode, median_blur,
                                                         select_strel)
from moseq2_detectron_extract_tpu.ops.preprocess import apply_roi, bbox_from_roi  # noqa: F401
from moseq2_detectron_extract_tpu.ops.ransac import plane_ransac  # noqa: F401

# 8-connectivity, matching skimage.measure.label's default for 2D
_LABEL_STRUCTURE = np.ones((3, 3), dtype=int)


def get_bground_im(frames: np.ndarray, med_scale: int = 5) -> np.ndarray:
    '''Median-of-median background image (m2de/proc/roi.py:293-307):
    median-blur each sampled frame then take the per-pixel temporal median.'''
    import jax.numpy as jnp
    blurred = median_blur(jnp.asarray(frames), med_scale)
    return np.asarray(jnp.median(blurred, axis=0))


def get_roi(depth_image: np.ndarray,
            dilate_size: Tuple[int, int] = (10, 10), dilate_shape: str = 'ellipse',
            erode_size: Optional[Tuple[int, int]] = None, erode_shape: str = 'ellipse',
            noise_tolerance: float = 30.0, weights: Tuple[float, float, float] = (1, .1, 1),
            depth_range: Tuple[float, float] = (650, 750),
            gradient_filter: bool = False, gradient_threshold: float = 3000,
            gradient_kernel: int = 7, fill_holes: bool = True,
            iters: int = 1000, in_ratio: float = 0.1, seed: int = 0):
    '''Detect candidate ROIs by plane RANSAC + connected-region ranking.

    Returns (rois, plane): ``rois`` is a list of boolean masks sorted by the
    weighted (area, extent, center-distance) rank of m2de/proc/roi.py:52-104.
    '''
    depth_image = np.asarray(depth_image, dtype='float64')

    mask = None
    if gradient_filter:
        gy, gx = np.gradient(depth_image)
        # reference uses Sobel(ksize=gradient_kernel); central differences scaled
        # to a comparable magnitude serve the same wall-exclusion purpose
        scale = 2.0 ** (2 * gradient_kernel - 3) / 8.0
        mask = np.logical_and(np.abs(gx) * scale < gradient_threshold,
                              np.abs(gy) * scale < gradient_threshold)

    plane, dists = plane_ransac(depth_image, depth_range=depth_range, iters=iters,
                                noise_tolerance=noise_tolerance, in_ratio=in_ratio,
                                mask=mask, seed=seed)
    plane = np.asarray(plane)
    dist_im = np.asarray(dists).reshape(depth_image.shape)
    if gradient_filter and mask is not None:
        dist_im[~mask] = np.inf

    bin_im = dist_im < noise_tolerance

    labels, nlabels = scipy.ndimage.label(bin_im, structure=_LABEL_STRUCTURE)
    if nlabels == 0:
        return [np.zeros_like(bin_im)], plane

    center = np.array(depth_image.shape) / 2
    areas = np.zeros(nlabels)
    extents = np.zeros(nlabels)
    cdists = np.zeros(nlabels)
    slices = scipy.ndimage.find_objects(labels)
    for i in range(nlabels):
        region = labels == (i + 1)
        areas[i] = region.sum()
        sl = slices[i]
        bbox_area = (sl[0].stop - sl[0].start) * (sl[1].stop - sl[1].start)
        extents[i] = areas[i] / max(bbox_area, 1)
        ys, xs = np.nonzero(region)
        cdists[i] = np.sqrt(((ys - center[0]) ** 2 + (xs - center[1]) ** 2)).max()

    ranks = np.vstack((scipy.stats.rankdata(-areas, method='max'),
                       scipy.stats.rankdata(-extents, method='max'),
                       scipy.stats.rankdata(cdists, method='max')))
    weight_array = np.array(weights, 'float32')
    shape_index = np.mean(ranks.astype('float32') * weight_array[:, None], 0).argsort()

    import jax.numpy as jnp
    rois = []
    for shape in shape_index:
        roi = (labels == (shape + 1)).astype('uint8')
        if dilate_size is not None and min(dilate_size) > 0:
            strel = select_strel(dilate_shape, tuple(dilate_size))
            roi = np.asarray(dilate(jnp.asarray(roi[None]), strel, 1))[0]
        if erode_size is not None and min(erode_size) > 0:
            strel = select_strel(erode_shape, tuple(erode_size))
            roi = np.asarray(erode(jnp.asarray(roi[None]), strel, 1))[0]
        if fill_holes:
            roi = scipy.ndimage.binary_fill_holes(roi > 0)
        rois.append(np.asarray(roi) > 0)

    return rois, plane
