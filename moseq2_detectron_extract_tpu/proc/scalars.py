'''Per-frame scalar features (parity: m2de/proc/scalars.py).

The frame-dependent reductions (area, average height) run on device via jnp;
the remainder is cheap vector math.
'''
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from moseq2_detectron_extract_tpu.proc.util import convert_pxs_to_mm


def scalar_attributes() -> Dict[str, str]:
    '''Scalar name -> description map (m2de/proc/scalars.py:6-33).'''
    return {
        'centroid_x_px': 'X centroid (pixels)',
        'centroid_y_px': 'Y centroid (pixels)',
        'velocity_2d_px': '2D velocity (pixels / frame), note that missing frames are not accounted for',
        'velocity_3d_px': '3D velocity (pixels / frame), note that missing frames are not accounted for, also height is in mm, not pixels for calculation',
        'width_px': 'Mouse width (pixels)',
        'length_px': 'Mouse length (pixels)',
        'area_px': 'Mouse area (pixels)',
        'centroid_x_mm': 'X centroid (mm)',
        'centroid_y_mm': 'Y centroid (mm)',
        'velocity_2d_mm': '2D velocity (mm / frame), note that missing frames are not accounted for',
        'velocity_3d_mm': '3D velocity (mm / frame), note that missing frames are not accounted for',
        'width_mm': 'Mouse width (mm)',
        'length_mm': 'Mouse length (mm)',
        'area_mm': 'Mouse area (mm)',
        'height_ave_mm': 'Mouse average height (mm)',
        'angle': 'Angle (radians, unwrapped)',
        'velocity_theta': 'Angular component of velocity (arctan(vel_x, vel_y))',
    }


@jax.jit
def _frame_height_stats(frames, min_height, max_height):
    masked = (frames > min_height) & (frames < max_height)
    nmask = jnp.sum(masked, axis=(1, 2))
    total = jnp.sum(jnp.where(masked, frames.astype(jnp.float32), 0.0), axis=(1, 2))
    height_ave = jnp.where(nmask > 0, total / jnp.maximum(nmask, 1), 0.0)
    return nmask, height_ave


def dispatch_scalar_stats(frames, min_height: float = 10,
                          max_height: float = 100):
    '''Dispatch the frame-dependent device reductions (area + average height)
    without synchronizing; pass the returned handles to ``compute_scalars``
    as ``height_stats`` so the pipeline overlaps the device wait.'''
    return _frame_height_stats(jnp.asarray(frames), float(min_height),
                               float(max_height))


def compute_scalars(frames: np.ndarray, track_features: dict, min_height: float = 10,
                    max_height: float = 100, true_depth: float = 673.1,
                    height_stats=None) -> Dict[str, np.ndarray]:
    '''Compute the 17 per-frame scalars (m2de/proc/scalars.py:36-120).

    frames: (N, H, W) uncropped (ROI-frame) depth in mm; track_features must
    hold 'centroid' (N, 2), 'orientation' (N,), 'axis_length' (N, 2).
    ``height_stats`` accepts pre-dispatched ``dispatch_scalar_stats`` handles
    (``frames`` may then be None).
    '''
    centroid = np.asarray(track_features['centroid'], dtype=float)
    axis_length = np.asarray(track_features['axis_length'], dtype=float)
    orientation = np.asarray(track_features['orientation'], dtype=float)

    features: Dict[str, np.ndarray] = {}

    centroid_mm = convert_pxs_to_mm(centroid, true_depth=true_depth)
    centroid_mm_shift = convert_pxs_to_mm(centroid + 1, true_depth=true_depth)
    px_to_mm = np.abs(centroid_mm_shift - centroid_mm)

    features['centroid_x_px'] = centroid[:, 0].astype('float32')
    features['centroid_y_px'] = centroid[:, 1].astype('float32')
    features['centroid_x_mm'] = centroid_mm[:, 0].astype('float32')
    features['centroid_y_mm'] = centroid_mm[:, 1].astype('float32')

    with np.errstate(invalid='ignore'):
        features['width_px'] = np.min(axis_length, axis=1).astype('float32')
        features['length_px'] = np.max(axis_length, axis=1).astype('float32')

    if height_stats is None:
        height_stats = dispatch_scalar_stats(frames, min_height, max_height)
    nmask, height_ave = height_stats
    features['area_px'] = np.asarray(nmask, dtype='float64')
    features['height_ave_mm'] = np.asarray(height_ave, dtype='float32')

    features['width_mm'] = (features['width_px'] * px_to_mm[:, 1]).astype('float32')
    features['length_mm'] = (features['length_px'] * px_to_mm[:, 0]).astype('float32')
    features['area_mm'] = features['area_px'] * px_to_mm.mean(axis=1)

    features['angle'] = np.deg2rad(orientation).astype('float32')

    def _vel(series):
        return np.diff(np.concatenate((series[:1], series)))

    vel_x = _vel(features['centroid_x_px'])
    vel_y = _vel(features['centroid_y_px'])
    vel_z = _vel(features['height_ave_mm'])
    features['velocity_2d_px'] = np.hypot(vel_x, vel_y).astype('float32')
    features['velocity_3d_px'] = np.sqrt(vel_x ** 2 + vel_y ** 2 + vel_z ** 2).astype('float32')

    vel_x_mm = _vel(features['centroid_x_mm'])
    vel_y_mm = _vel(features['centroid_y_mm'])
    features['velocity_2d_mm'] = np.hypot(vel_x_mm, vel_y_mm).astype('float32')
    features['velocity_3d_mm'] = np.sqrt(vel_x_mm ** 2 + vel_y_mm ** 2 + vel_z ** 2).astype('float32')
    features['velocity_theta'] = np.arctan2(vel_y_mm, vel_x_mm)

    return features
