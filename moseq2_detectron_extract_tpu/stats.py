'''Outlier statistics (parity: m2de/stats.py:4-75).'''
import numpy as np


def is_outlier(points: np.ndarray, thresh: float = 3.5) -> np.ndarray:
    '''MAD-based modified z-score outlier test (Iglewicz & Hoaglin).

    Returns a boolean mask where True marks outliers. NaN-tolerant like the
    reference (nanmedian/nansum).
    '''
    points = np.asarray(points)
    if points.ndim == 1:
        points = points[:, None]
    median = np.nanmedian(points, axis=0)
    diff = np.sqrt(np.nansum((points - median) ** 2, axis=-1))
    mad = np.nanmedian(diff)
    with np.errstate(divide='ignore', invalid='ignore'):
        modified_z_score = 0.6745 * diff / mad
    return modified_z_score > thresh


def exclude_outliers(data: np.ndarray, threshold: float = 3.5) -> np.ndarray:
    '''The values of ``data`` that are not outliers (m2de/stats.py:33-47).'''
    data = np.asarray(data)
    return data[~is_outlier(data, threshold)]


def max_exclude_outliers(data: np.ndarray, threshold: float = 3.5):
    '''Max of ``data`` excluding outliers (m2de/stats.py:50-61).'''
    return exclude_outliers(data, threshold).max()


def min_exclude_outliers(data: np.ndarray, threshold: float = 3.5):
    '''Min of ``data`` excluding outliers (m2de/stats.py:64-75).'''
    return exclude_outliers(data, threshold).min()
