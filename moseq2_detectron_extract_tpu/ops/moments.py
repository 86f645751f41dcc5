'''Batched image-moment features from foreground masks.

Replaces the per-frame cv2.findContours + cv2.moments detour of
m2de/proc/proc.py:237-302,518-549 (``get_frame_features`` /
``im_moment_features``): the centroid / orientation / ellipse-axis features are
moments of the foreground region, so we compute raw+central moments directly
from mask pixels with XLA reductions — no contour extraction needed.
(The reference computes polygon moments of the largest contour; pixel moments
of the same filled region agree to sub-pixel tolerance.)
'''
import jax
import jax.numpy as jnp


@jax.jit
def mask_moments(masks: jnp.ndarray):
    '''Raw and central moments of binary masks (N, H, W).

    Returns dict with m00, m10, m01, mu20, mu11, mu02 (float32, shape (N,)).
    '''
    m = masks.astype(jnp.float32)
    height, width = masks.shape[1], masks.shape[2]
    ygrid = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xgrid = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)

    m00 = jnp.sum(m, axis=(1, 2))
    m10 = jnp.sum(m * xgrid, axis=(1, 2))
    m01 = jnp.sum(m * ygrid, axis=(1, 2))
    safe = jnp.maximum(m00, 1e-12)
    cx = m10 / safe
    cy = m01 / safe
    dx = xgrid[None] - cx[:, None, None]
    dy = ygrid[None] - cy[:, None, None]
    mu20 = jnp.sum(m * dx * dx, axis=(1, 2))
    mu11 = jnp.sum(m * dx * dy, axis=(1, 2))
    mu02 = jnp.sum(m * dy * dy, axis=(1, 2))
    return {'m00': m00, 'm10': m10, 'm01': m01,
            'mu20': mu20, 'mu11': mu11, 'mu02': mu02}


@jax.jit
def mask_moment_features(masks: jnp.ndarray):
    '''Centroid / orientation / ellipse axis lengths from binary masks (N, H, W).

    Same formulas as m2de/proc/proc.py:518-549: orientation =
    -0.5*atan2(2*mu11, mu20-mu02) (radians); axis lengths are the major/minor
    ellipse axes. Frames with empty masks yield NaNs (parity with reference).
    '''
    mom = mask_moments(masks)
    m00 = mom['m00']
    safe = jnp.maximum(m00, 1e-12)

    num = 2.0 * mom['mu11']
    den = mom['mu20'] - mom['mu02']
    common = jnp.sqrt(4.0 * jnp.square(mom['mu11']) + jnp.square(den))

    orientation = -0.5 * jnp.arctan2(num, den)
    centroid = jnp.stack([mom['m10'] / safe, mom['m01'] / safe], axis=-1)
    major = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(jnp.maximum(
        (mom['mu20'] + mom['mu02'] + common) / safe, 0.0))
    minor = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(jnp.maximum(
        (mom['mu20'] + mom['mu02'] - common) / safe, 0.0))
    axis_length = jnp.stack([major, minor], axis=-1)

    empty = m00 <= 0
    nan = jnp.nan
    return {
        'centroid': jnp.where(empty[:, None], nan, centroid),
        'orientation': jnp.where(empty, nan, orientation),
        'axis_length': jnp.where(empty[:, None], nan, axis_length),
    }
