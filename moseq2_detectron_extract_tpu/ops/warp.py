'''Batched affine crop-and-rotate on device.

Replaces the per-frame cv2.copyMakeBorder + cv2.warpAffine loop of
m2de/proc/proc.py:305-417 (``crop_and_rotate_frame`` and its reverse) with
vmapped bilinear-gather programs.

Subtlety kept for parity: the reference crops the window *before* rotating,
so output pixels whose rotated source lies outside the crop window are zero
even when the underlying frame has data there. We therefore sample in window
coordinates and mask taps to the window rect.
'''
import functools

import jax
import jax.numpy as jnp


def _cv2_rotation_matrix(center, angle_deg, scale=1.0):
    '''3x3 forward affine equal to cv2.getRotationMatrix2D(center, angle, scale).'''
    theta = jnp.deg2rad(angle_deg)
    alpha = scale * jnp.cos(theta)
    beta = scale * jnp.sin(theta)
    cx, cy = center[0], center[1]
    return jnp.array([
        [alpha, beta, (1.0 - alpha) * cx - beta * cy],
        [-beta, alpha, beta * cx + (1.0 - alpha) * cy],
        [0.0, 0.0, 1.0],
    ])


def _invert_affine(m):
    '''Closed-form inverse of a 3x3 affine [[a,b,tx],[c,d,ty],[0,0,1]].'''
    a, b, tx = m[0, 0], m[0, 1], m[0, 2]
    c, d, ty = m[1, 0], m[1, 1], m[1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return jnp.array([
        [ia, ib, -(ia * tx + ib * ty)],
        [ic, id_, -(ic * tx + id_ * ty)],
        [0.0, 0.0, 1.0],
    ])


def _bilinear_window_sample(img, wxs, wys, off_x, off_y, win_w, win_h):
    '''Bilinear sample at window coords (wxs, wys); tap (wx, wy) reads
    ``img[wy + off_y, wx + off_x]`` and is zero outside the window rect
    [0, win_w) x [0, win_h) or outside the image (cv2 zero-border).'''
    h, w = img.shape
    x0 = jnp.floor(wxs)
    y0 = jnp.floor(wys)
    fx = wxs - x0
    fy = wys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    offx = jnp.round(off_x).astype(jnp.int32)
    offy = jnp.round(off_y).astype(jnp.int32)

    def tap(wyi, wxi):
        in_window = (wxi >= 0) & (wxi < win_w) & (wyi >= 0) & (wyi < win_h)
        xi = wxi + offx
        yi = wyi + offy
        in_img = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(in_window & in_img, v.astype(jnp.float32), 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _inverse_map_grid(inv_matrix, out_h, out_w):
    ygrid = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xgrid = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    src_x = inv_matrix[0, 0] * xgrid + inv_matrix[0, 1] * ygrid + inv_matrix[0, 2]
    src_y = inv_matrix[1, 0] * xgrid + inv_matrix[1, 1] * ygrid + inv_matrix[1, 2]
    return src_x, src_y


@functools.partial(jax.jit, static_argnames=('crop_size',))
def crop_and_rotate_frames(frames: jnp.ndarray, centers: jnp.ndarray,
                           angles_deg: jnp.ndarray,
                           crop_size=(80, 80)) -> jnp.ndarray:
    '''Crop ``crop_size`` windows at ``centers`` and rotate by ``angles_deg``.

    Parity with m2de/proc/proc.py:305-340: the window origin is
    ``int(center - crop//2)`` (truncating like the reference), rotation is
    cv2.getRotationMatrix2D about the crop center, bilinear, zero border, and
    rotated taps outside the crop window are zero. NaN angle/center or
    negative center yields a zero frame.

    frames: (N, H, W); centers: (N, 2 [x, y]); angles_deg: (N,).
    Returns float32 (N, crop_h, crop_w) — cast at call site if needed.
    '''
    crop_w, crop_h = int(crop_size[0]), int(crop_size[1])
    crop_center = (crop_w // 2, crop_h // 2)

    def one(img, center, angle):
        invalid = (jnp.isnan(angle) | jnp.any(jnp.isnan(center)) |
                   jnp.any(center < 0))
        safe_center = jnp.where(jnp.isnan(center), 0.0, center)
        safe_angle = jnp.where(jnp.isnan(angle), 0.0, angle)

        # window origin in source-frame coords (truncation parity with int())
        ox = jnp.trunc(safe_center[0] - crop_w // 2)
        oy = jnp.trunc(safe_center[1] - crop_h // 2)
        rot_inv = _invert_affine(_cv2_rotation_matrix(crop_center, safe_angle))
        wx, wy = _inverse_map_grid(rot_inv, crop_h, crop_w)
        out = _bilinear_window_sample(img, wx, wy, ox, oy, crop_w, crop_h)
        return jnp.where(invalid, jnp.zeros_like(out), out)

    return jax.vmap(one)(frames, centers.astype(jnp.float32),
                         angles_deg.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('dest_size',))
def reverse_crop_and_rotate_frames(frames: jnp.ndarray, centers: jnp.ndarray,
                                   angles_deg: jnp.ndarray,
                                   dest_size=(512, 424)) -> jnp.ndarray:
    '''Inverse of :func:`crop_and_rotate_frames` (m2de/proc/proc.py:343-371).

    Two warps like the reference: rotate by -angle about the crop center into
    the dest canvas, then translate by (center - crop_center). frames:
    (N, crop_h, crop_w); dest_size: (width, height). Returns float32
    (N, dest_h, dest_w).
    '''
    dest_w, dest_h = int(dest_size[0]), int(dest_size[1])

    def one(img, center, angle):
        invalid = jnp.isnan(angle) | jnp.any(jnp.isnan(center))
        safe_center = jnp.where(jnp.isnan(center), 0.0, center)
        safe_angle = jnp.where(jnp.isnan(angle), 0.0, angle)

        src_center = (img.shape[1] // 2, img.shape[0] // 2)
        rot_inv = _invert_affine(_cv2_rotation_matrix(src_center, -safe_angle))
        wx1, wy1 = _inverse_map_grid(rot_inv, dest_h, dest_w)
        stage1 = _bilinear_window_sample(img, wx1, wy1, 0.0, 0.0,
                                         img.shape[1], img.shape[0])

        tx = safe_center[0] - src_center[0]
        ty = safe_center[1] - src_center[1]
        ygrid = jax.lax.broadcasted_iota(jnp.float32, (dest_h, dest_w), 0)
        xgrid = jax.lax.broadcasted_iota(jnp.float32, (dest_h, dest_w), 1)
        out = _bilinear_window_sample(stage1, xgrid - tx, ygrid - ty, 0.0, 0.0,
                                      dest_w, dest_h)
        return jnp.where(invalid, jnp.zeros_like(out), out)

    return jax.vmap(one)(frames, centers.astype(jnp.float32),
                         angles_deg.astype(jnp.float32))
