'''Outlier statistics (parity: m2de/stats.py:4-30).'''
import numpy as np


def is_outlier(points: np.ndarray, thresh: float = 3.5) -> np.ndarray:
    '''MAD-based modified z-score outlier test (Iglewicz & Hoaglin).

    Returns a boolean mask where True marks outliers.
    '''
    points = np.asarray(points)
    if points.ndim == 1:
        points = points[:, None]
    median = np.median(points, axis=0)
    diff = np.sqrt(np.sum((points - median) ** 2, axis=-1))
    mad = np.median(diff)
    with np.errstate(divide='ignore', invalid='ignore'):
        modified_z_score = 0.6745 * diff / mad
    return modified_z_score > thresh
