'''Device-side training augmentations (PRNG-keyed, batched, jit-safe).

Parity targets: the reference's aug stack (m2de/model/model.py:31-45) and its
custom depth-noise family (m2de/model/augmentations/):

- random rotation 0-359 deg + random scale 0.75-1.2 (one fused affine sample)
- brightness 0.9-1.1, contrast 0.9-1.1, additive gaussian noise (GaussNoise)
- Gaussian-random-field noise via FFT spectral synthesis
  (random_field_noise.py:38-107: power-law spectrum, |field| rescaled to a
  random max intensity, masked away from the animal, added to the image)
- particle noise: GRF masked to random circles + elastic deformation
  (particle_noise.py:40-75), 1-4 particles, additive
- doughnut GRF noise simulating arena walls (doughnut_noise.py:62-118)

All of it runs inside the train step on device: the host loader only supplies
canvas-sized images + gt. Boxes are recomputed from the augmented masks
(m2de/model/mapper.py:88-90).
'''
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.models.config import ModelConfig

_EPS = 2.220446049250313e-16


# ---------------------------------------------------------------------------
# gaussian random fields (FFT spectral synthesis)
# ---------------------------------------------------------------------------

def grf_field(key, shape: Tuple[int, int], std: float, power_exp) -> jnp.ndarray:
    '''Sample a Gaussian random field with power-law spectrum P(k) ~ k^-n.

    FFT-native synthesis (the TPU-friendly equivalent of FyeldGenerator):
    complex white noise shaped by sqrt(P(k)) and inverse-FFT'd.
    '''
    h, w = shape
    ky = jnp.fft.fftfreq(h)[:, None]
    kx = jnp.fft.fftfreq(w)[None, :]
    knorm = jnp.sqrt(ky * ky + kx * kx)
    amplitude = jnp.power(knorm + _EPS, -power_exp / 2.0)
    amplitude = amplitude.at[0, 0].set(0.0)

    k1, k2 = jax.random.split(key)
    noise = (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape)) * std
    field = jnp.fft.ifft2(noise * amplitude).real
    return field * (h * w) ** 0.5  # undo ifft normalization scale


def rescale_intensity(field: jnp.ndarray, vmax) -> jnp.ndarray:
    '''Linear stretch to [0, vmax] (random_field_noise.py:70-85).'''
    dmin = jnp.min(field)
    dmax = jnp.max(field)
    return (field - dmin) * (vmax / jnp.maximum(dmax - dmin, 1e-9))


def _circular_mask(shape, center, radius):
    h, w = shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return jnp.sqrt((xx - center[0]) ** 2 + (yy - center[1]) ** 2) <= radius


def _doughnut_mask(shape, thickness):
    h, w = shape
    center = (w / 2.0, h / 2.0)
    radius = jnp.minimum(jnp.asarray(center[0]), jnp.asarray(center[1]))
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dist = jnp.sqrt((xx - center[0]) ** 2 + (yy - center[1]) ** 2)
    return (dist <= radius) & (dist >= radius - thickness)


def elastic_deform(key, image: jnp.ndarray, sigma, points: int = 8) -> jnp.ndarray:
    '''Random-grid elastic deformation (elasticdeform.deform_random_grid
    equivalent): displacements drawn on a coarse control grid, bilinearly
    upsampled, applied via bilinear resampling.'''
    h, w = image.shape
    disp = jax.random.normal(key, (2, points, points)) * sigma
    disp_full = jax.image.resize(disp, (2, h, w), method='bicubic')
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + disp_full[0]
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + disp_full[1]

    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    fx = xx - x0
    fy = yy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = image[y0i, x0i]
    v01 = image[y0i, x1i]
    v10 = image[y1i, x0i]
    v11 = image[y1i, x1i]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


# ---------------------------------------------------------------------------
# noise augmentations (each applied with probability p, masked off the animal)
# ---------------------------------------------------------------------------

def random_field_noise(key, image, animal_mask, p=0.5):
    '''GRF noise added to the background (random_field_noise.py:87-107).'''
    k_apply, k_std, k_pow, k_int, k_field = jax.random.split(key, 5)
    std = jax.random.uniform(k_std, (), minval=5.0, maxval=100.0)
    power = jax.random.uniform(k_pow, (), minval=1.0, maxval=4.0)
    imax = jax.random.uniform(k_int, (), minval=5.0, maxval=65.0)
    field = grf_field(k_field, image.shape, std, power)
    field = field * (1.0 - animal_mask)
    field = rescale_intensity(jnp.abs(field), imax)
    apply = jax.random.uniform(k_apply) < p
    return jnp.where(apply, image + field, image)


def particle_noise(key, image, p=0.5, max_particles: int = 4):
    '''1-4 elastic-deformed GRF particles added to the image
    (particle_noise.py:40-75). Not animal-masked in the reference.'''
    h, w = image.shape
    k_apply, k_n, *particle_keys = jax.random.split(key, 2 + max_particles)
    n_particles = jax.random.randint(k_n, (), 1, max_particles + 1)

    def one_particle(i, acc):
        pk = jax.random.fold_in(k_apply, i + 1)
        k_r, k_c1, k_c2, k_std, k_pow, k_int, k_field, k_def = jax.random.split(pk, 8)
        radius = jax.random.uniform(k_r, (), minval=3.0, maxval=20.0)
        center = (jax.random.uniform(k_c1, (), minval=0.0, maxval=w),
                  jax.random.uniform(k_c2, (), minval=0.0, maxval=h))
        std = jax.random.uniform(k_std, (), minval=75.0, maxval=100.0)
        power = jax.random.uniform(k_pow, (), minval=2.5, maxval=4.0)
        imax = jax.random.uniform(k_int, (), minval=30.0, maxval=250.0)
        field = grf_field(k_field, (h, w), std, power)
        field = jnp.where(_circular_mask((h, w), center, radius), field, 0.0)
        field = elastic_deform(k_def, field, sigma=radius / 2.0, points=8)
        field = rescale_intensity(jnp.abs(field), imax)
        return acc + jnp.where(i < n_particles, field, 0.0)

    field = jax.lax.fori_loop(0, max_particles, one_particle,
                              jnp.zeros_like(image))
    apply = jax.random.uniform(k_apply) < p
    return jnp.where(apply, image + field, image)


def doughnut_grf_noise(key, image, animal_mask, p=0.5):
    '''Arena-wall ring noise (doughnut_noise.py:62-118).'''
    k_apply, k_th, k_std, k_pow, k_int, k_field = jax.random.split(key, 6)
    thickness = jax.random.uniform(k_th, (), minval=0.0, maxval=30.0)
    std = jax.random.uniform(k_std, (), minval=75.0, maxval=100.0)
    power = jax.random.uniform(k_pow, (), minval=1.5, maxval=2.5)
    imax = jax.random.uniform(k_int, (), minval=30.0, maxval=100.0)
    field = grf_field(k_field, image.shape, std, power)
    field = jnp.where(_doughnut_mask(image.shape, thickness), field, 0.0)
    field = rescale_intensity(jnp.abs(field), imax)
    field = field * (1.0 - animal_mask)
    apply = jax.random.uniform(k_apply) < p
    return jnp.where(apply, image + field, image)


def max_blend(image, src_image):
    '''Per-pixel max blend (m2de/model/augmentations/occlude_transform.py
    MaxBlendTransform).'''
    return jnp.where(image > src_image, image, src_image)


def threshold_blend(image, src_image, threshold):
    '''Keep image where it exceeds ``threshold``, else take ``src_image``
    (ThresholdBlendTransform).'''
    return jnp.where(image > threshold, image, src_image)


def gauss_noise(key, image, p=0.5):
    '''Albumentations GaussNoise (var 10-50) equivalent.'''
    k_apply, k_var, k_noise = jax.random.split(key, 3)
    var = jax.random.uniform(k_var, (), minval=10.0, maxval=50.0)
    noise = jax.random.normal(k_noise, image.shape) * jnp.sqrt(var)
    apply = jax.random.uniform(k_apply) < p
    return jnp.where(apply, image + noise, image)


# ---------------------------------------------------------------------------
# geometric + photometric
# ---------------------------------------------------------------------------

def _affine_sample(image, matrix_inv, order_nearest=False):
    '''Sample image through an inverse affine map (zero border).'''
    h, w = image.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = matrix_inv[0, 0] * xx + matrix_inv[0, 1] * yy + matrix_inv[0, 2]
    sy = matrix_inv[1, 0] * xx + matrix_inv[1, 1] * yy + matrix_inv[1, 2]
    if order_nearest:
        xi = jnp.round(sx).astype(jnp.int32)
        yi = jnp.round(sy).astype(jnp.int32)
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        vals = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb, vals, 0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb, v.astype(jnp.float32), 0.0)

    return (tap(y0i, x0i) * (1 - fx) * (1 - fy) + tap(y0i, x0i + 1) * fx * (1 - fy)
            + tap(y0i + 1, x0i) * (1 - fx) * fy + tap(y0i + 1, x0i + 1) * fx * fy)


def _rotation_scale_matrix(center, angle_deg, scale):
    theta = jnp.deg2rad(angle_deg)
    cos = jnp.cos(theta) * scale
    sin = jnp.sin(theta) * scale
    cx, cy = center
    return jnp.array([[cos, -sin, cx - cos * cx + sin * cy],
                      [sin, cos, cy - sin * cx - cos * cy],
                      [0.0, 0.0, 1.0]])


def _invert_affine(m):
    a, b, tx = m[0, 0], m[0, 1], m[0, 2]
    c, d, ty = m[1, 0], m[1, 1], m[1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return jnp.array([[ia, ib, -(ia * tx + ib * ty)],
                      [ic, id_, -(ic * tx + id_ * ty)],
                      [0.0, 0.0, 1.0]])


def augment_sample(key, image, masks, keypoints, gt_valid,
                   cfg: ModelConfig) -> Dict[str, jnp.ndarray]:
    '''Full augmentation of one sample.

    image (S, S) float; masks (G, S, S) bool; keypoints (G, K, 3 [x, y, v]).
    Returns augmented image (S, S), masks, keypoints, and boxes recomputed
    from masks.
    '''
    s = image.shape[0]
    (k_rot, k_scale, k_bright, k_contrast, k_gauss, k_grf, k_part,
     k_donut) = jax.random.split(key, 8)

    # geometry: rotation 0-359 + scale 0.75-1.2 about the canvas center
    angle = jax.random.uniform(k_rot, (), minval=0.0, maxval=359.0)
    scale = jax.random.uniform(k_scale, (), minval=0.75, maxval=1.2)
    center = (s / 2.0, s / 2.0)
    fwd = _rotation_scale_matrix(center, angle, scale)
    inv = _invert_affine(fwd)
    image = _affine_sample(image, inv)
    masks = jax.vmap(lambda m: _affine_sample(m.astype(jnp.float32), inv) > 0.5)(masks)

    kp_xy = keypoints[..., :2]
    new_x = fwd[0, 0] * kp_xy[..., 0] + fwd[0, 1] * kp_xy[..., 1] + fwd[0, 2]
    new_y = fwd[1, 0] * kp_xy[..., 0] + fwd[1, 1] * kp_xy[..., 1] + fwd[1, 2]
    inside = (new_x >= 0) & (new_x < s) & (new_y >= 0) & (new_y < s)
    new_v = jnp.where(inside, keypoints[..., 2], 0.0)
    keypoints = jnp.stack([new_x, new_y, new_v], axis=-1)

    # photometric
    brightness = jax.random.uniform(k_bright, (), minval=0.9, maxval=1.1)
    contrast = jax.random.uniform(k_contrast, (), minval=0.9, maxval=1.1)
    mean = jnp.mean(image)
    image = (image - mean) * contrast + mean
    image = image * brightness

    # noise family, masked off the animal where the reference does
    animal = jnp.any(masks & gt_valid[:, None, None], axis=0).astype(jnp.float32)
    image = gauss_noise(k_gauss, image, p=0.5)
    image = doughnut_grf_noise(k_donut, image, animal, p=0.5)
    image = particle_noise(k_part, image, p=0.5)
    image = random_field_noise(k_grf, image, animal, p=0.5)
    image = jnp.clip(image, 0.0, 255.0)

    # recompute boxes from augmented masks (m2de/model/mapper.py:88-90)
    ys = jax.lax.broadcasted_iota(jnp.float32, masks.shape[1:], 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, masks.shape[1:], 1)

    def box_of(mask):
        any_mask = jnp.any(mask)
        x1 = jnp.min(jnp.where(mask, xs, jnp.inf))
        y1 = jnp.min(jnp.where(mask, ys, jnp.inf))
        x2 = jnp.max(jnp.where(mask, xs, -jnp.inf)) + 1
        y2 = jnp.max(jnp.where(mask, ys, -jnp.inf)) + 1
        return jnp.where(any_mask, jnp.stack([x1, y1, x2, y2]), jnp.zeros(4))

    boxes = jax.vmap(box_of)(masks)
    valid = gt_valid & jnp.any(masks, axis=(1, 2))

    return {'image': image, 'masks': masks, 'keypoints': keypoints,
            'boxes': boxes, 'valid': valid}


def augment_batch(key, images, masks, keypoints, gt_valid, cfg: ModelConfig):
    '''vmapped :func:`augment_sample` over the batch; returns the gt dict for
    :meth:`MaskKeypointRCNN.losses` plus normalized 3-channel images.'''
    keys = jax.random.split(key, images.shape[0])
    out = jax.vmap(lambda k, i, m, kp, v: augment_sample(k, i, m, kp, v, cfg))(
        keys, images, masks, keypoints, gt_valid)

    x = jnp.repeat(out['image'][..., None], 3, axis=-1)
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    x = (x - mean) / std
    gt = {'boxes': out['boxes'], 'valid': out['valid'], 'masks': out['masks'],
          'keypoints': out['keypoints']}
    return x, gt
