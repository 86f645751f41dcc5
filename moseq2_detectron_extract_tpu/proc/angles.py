'''Angle utilities: clamping, differences, moving-median flip filtering.

Parity targets: m2de/proc/proc.py:600-654,688-697 (``filter_angles`` /
``iterative_filter_angles`` / clamps) and m2de/proc/kalman.py:93-98
(``angle_difference``). The iterative fixpoint filter runs as a single
jitted ``lax.while_loop`` on device instead of a python loop of bottleneck
``move_median`` calls.
'''
import functools

import jax
import jax.numpy as jnp
import numpy as np


def clamp_angles_deg(angles):
    '''Clamp angles into [0, 360) (m2de/proc/proc.py:688-691).'''
    angles = jnp.asarray(angles)
    return jnp.where(angles < 0, 360 + angles, angles) % 360


def clamp_angles_rad(angles):
    '''Clamp angles into [0, 2*pi) (m2de/proc/proc.py:694-697).'''
    angles = jnp.asarray(angles)
    return jnp.where(angles < 0, (2 * jnp.pi) + angles, angles) % (2 * jnp.pi)


def angle_difference(angles1, angles2):
    '''Smallest signed difference angles2 - angles1 in degrees, in (-180, 180]
    (m2de/proc/kalman.py:93-98).'''
    diff = (jnp.asarray(angles2) - jnp.asarray(angles1)) % 360
    return jnp.where(diff > 180, -(360 - diff), diff)


def _move_median3(a):
    '''Trailing moving median, window 3, min_count 1 (bottleneck.move_median).

    index 0 -> a[0]; index 1 -> mean(a[0], a[1]); index >= 2 -> median of 3.
    '''
    n = a.shape[0]
    prev1 = jnp.concatenate([a[:1], a[:-1]])
    prev2 = jnp.concatenate([a[:1], a[:1], a[:-2]])
    med3 = jnp.sort(jnp.stack([a, prev1, prev2]), axis=0)[1]
    idx = jnp.arange(n)
    out = jnp.where(idx >= 2, med3, a)
    out = jnp.where(idx == 1, (a + prev1) / 2.0, out)
    return out


def _move_median(a, window: int):
    '''Trailing moving median with partial windows averaged like bottleneck
    (min_count=1): nan-padded history + nanmedian.'''
    if window == 3:
        return _move_median3(a)
    hist = [a]
    for k in range(1, window):
        hist.append(jnp.concatenate([jnp.full((k,), jnp.nan, a.dtype), a[:-k]]))
    return jnp.nanmedian(jnp.stack(hist), axis=0)


@functools.partial(jax.jit, static_argnames=('window',))
def filter_angles(angles, window: int = 3, tolerance: float = 60.0):
    '''One pass of ~180-degree flip correction against a trailing moving median
    (m2de/proc/proc.py:600-624).'''
    angles = jnp.asarray(angles, jnp.float32)
    eff_window = min(window, int(angles.shape[0]))
    windows = _move_median(angles, eff_window)
    diff = angles - windows
    absdiff = jnp.abs(diff)
    flips = (absdiff > (180 - tolerance)) & (absdiff < (180 + tolerance))
    return jnp.where(flips, angles - 180 * jnp.sign(diff), angles)


@functools.partial(jax.jit, static_argnames=('window', 'max_iters'))
def iterative_filter_angles(angles, window: int = 3, tolerance: float = 60.0,
                            max_iters: int = 1000):
    '''Iterate :func:`filter_angles` to a fixpoint (m2de/proc/proc.py:627-654).

    Returns (filtered_angles, flips) where flips marks indices that ended up
    ~180 degrees from their input.
    '''
    angles = jnp.asarray(angles, jnp.float32)

    def cond(state):
        last, curr, it = state
        return (it <= max_iters) & ~jnp.allclose(curr, last)

    def body(state):
        _, curr, it = state
        return curr, filter_angles(curr, window=window, tolerance=tolerance), it + 1

    first = filter_angles(angles, window=window, tolerance=tolerance)
    _, curr, _ = jax.lax.while_loop(cond, body, (angles, first, jnp.asarray(1)))
    flips = jnp.isclose(jnp.abs(curr - angles), 180.0)
    return curr, flips


def hampel_filter(data: np.ndarray, span: int, sigma: float = 3) -> np.ndarray:
    '''Hampel (median/MAD) outlier replacement over a sliding window
    (m2de/proc/proc.py:453-477). 1D or 2D (per-column) data.'''
    data = np.asarray(data, dtype=float).copy()

    def _filter_1d(col):
        padded = np.pad(col, (span // 2, span // 2), 'constant',
                        constant_values=np.nan)
        windows = np.lib.stride_tricks.sliding_window_view(padded, span)
        med = np.nanmedian(windows, axis=1)
        mad = np.nanmedian(np.abs(windows - med[:, None]), axis=1)
        vals = np.abs(col - med[:len(col)])
        fill = vals > med[:len(col)] + sigma * mad[:len(col)]
        col[fill] = med[:len(col)][fill]
        return col

    if data.ndim == 1:
        return _filter_1d(data)
    if data.ndim == 2:
        for i in range(data.shape[1]):
            data[:, i] = _filter_1d(data[:, i])
        return data
    raise ValueError(f'cannot accept data with {data.ndim} dimentions!')


def feature_hampel_filter(features: dict, centroid_hampel_span=None,
                          centroid_hampel_sig=3, angle_hampel_span=None,
                          angle_hampel_sig=3) -> dict:
    '''Hampel-filter centroid/orientation features (m2de/proc/proc.py:420-450).'''
    if centroid_hampel_span is not None and centroid_hampel_span > 0:
        features['centroid'][:, 0] = hampel_filter(
            features['centroid'][:, 0], centroid_hampel_span, centroid_hampel_sig)
    if angle_hampel_span is not None and angle_hampel_span > 0:
        features['orientation'] = hampel_filter(
            features['orientation'], angle_hampel_span, angle_hampel_sig)
    return features


def interpolate_nan_values(data: np.ndarray) -> np.ndarray:
    '''Linear interpolation over NaN entries (m2de/proc/proc.py:988-994).'''
    data = np.asarray(data, dtype=float).copy()
    nans = np.isnan(data)
    if nans.all():
        return data
    idx = np.arange(len(data))
    data[nans] = np.interp(idx[nans], idx[~nans], data[~nans])
    return data
