'''Fused depth-frame preprocessing on device.

Replaces m2de/proc/proc.py:129-234 (``prep_raw_frames`` / ``scale_raw_frames`` /
``fill_invalid_pixels``). The whole prep for a chunk — background subtract,
ROI mask, clamp, dtype cast, invalid-pixel fill — is one jitted XLA program.

The reference fills Kinect dropout pixels (raw value 0) with cv2.inpaint
(Navier-Stokes, m2de/proc/proc.py:189-210). Here we use iterative harmonic
fill (Jacobi relaxation of the Laplace equation over the hole, Dirichlet
boundary = valid neighbors), which converges to a near-identical smooth
membrane for the small dropout specks seen in practice and is fully batched.
'''
import functools

import jax
import jax.numpy as jnp
import numpy as np


def find_invalid_pixels(frames: jnp.ndarray) -> jnp.ndarray:
    '''Mask of invalid (Kinect dropout) pixels: raw value == 0.'''
    return (frames == 0)


@functools.partial(jax.jit, static_argnames=('iterations',))
def fill_invalid_pixels(frames: jnp.ndarray, invalid_mask: jnp.ndarray,
                        iterations: int = 32) -> jnp.ndarray:
    '''Fill masked pixels with a smooth membrane interpolated from valid neighbors.

    (N, H, W) batched. Runs a fixed number of Jacobi iterations; the first
    sweep seeds holes with a valid-neighbor average so even pixels deep inside
    a hole receive values after ~hole_radius iterations.
    '''
    dtype = frames.dtype
    x = frames.astype(jnp.float32)
    invalid = invalid_mask.astype(jnp.bool_)
    valid = ~invalid

    # seed: average of valid neighbors where available, else global valid mean
    count_valid = jnp.maximum(jnp.sum(valid, axis=(1, 2), keepdims=True), 1)
    mean_valid = jnp.sum(jnp.where(valid, x, 0.0), axis=(1, 2), keepdims=True) / count_valid
    x = jnp.where(invalid, mean_valid, x)

    def neighbor_avg(img, known):
        kn = known.astype(jnp.float32)
        weighted = img * kn
        num = (jnp.pad(weighted, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
               + jnp.pad(weighted, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
               + jnp.pad(weighted, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
               + jnp.pad(weighted, ((0, 0), (0, 0), (0, 1)))[:, :, 1:])
        den = (jnp.pad(kn, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
               + jnp.pad(kn, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
               + jnp.pad(kn, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
               + jnp.pad(kn, ((0, 0), (0, 0), (0, 1)))[:, :, 1:])
        return num, den

    # first pass: region-grow from the valid boundary so hole interiors get
    # sensible values quickly
    known = valid
    def grow(state, _):
        img, known = state
        num, den = neighbor_avg(img, known)
        grown = den > 0
        fill = num / jnp.maximum(den, 1.0)
        img = jnp.where(~known & grown, fill, img)
        return (img, known | grown), None
    (x, _), _ = jax.lax.scan(grow, (x, known), None, length=8)

    # Jacobi relaxation: invalid pixels -> mean of 4 neighbors (all known now)
    all_known = jnp.ones_like(valid)
    def relax(img, _):
        num, den = neighbor_avg(img, all_known)
        smoothed = num / jnp.maximum(den, 1.0)
        return jnp.where(invalid, smoothed, img), None
    x, _ = jax.lax.scan(relax, x, None, length=iterations)

    if jnp.issubdtype(dtype, jnp.integer):
        x = jnp.clip(jnp.round(x), jnp.iinfo(dtype).min, jnp.iinfo(dtype).max)
    return x.astype(dtype)


@functools.partial(jax.jit, static_argnames=('out_dtype', 'fix_invalid_pixels',
                                             'fill_iterations'))
def _prep_raw_frames_impl(frames, bground_im, roi_mask, vmin, vmax,
                          out_dtype, fix_invalid_pixels, fill_iterations):
    invalid = find_invalid_pixels(frames) if fix_invalid_pixels else None

    x = frames.astype(jnp.float32)
    if bground_im is not None:
        x = bground_im.astype(jnp.float32)[None] - x
    if roi_mask is not None:
        x = x * roi_mask.astype(jnp.float32)[None]
    if vmin is not None:
        x = jnp.where(x < vmin, 0.0, x)
    if vmax is not None:
        x = jnp.minimum(x, vmax)

    if jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer):
        info = jnp.iinfo(jnp.dtype(out_dtype))
        x = jnp.clip(x, info.min, info.max)
    x = x.astype(out_dtype)

    if fix_invalid_pixels:
        x = fill_invalid_pixels(x, invalid, iterations=fill_iterations)
    return x


def prep_raw_frames(frames, bground_im=None, roi=None, vmin=None, vmax=None,
                    dtype='uint8', fix_invalid_pixels=True, fill_iterations=16):
    '''Prepare raw depth frames: bg-subtract, ROI mask + bbox crop, clamp, cast, fill.

    Parity with m2de/proc/proc.py:129-172. ``roi`` is a full-size 2D mask; the
    output is cropped to its bounding box (host-computed static shape so the
    device program stays statically shaped per session).

    Accepts/returns numpy or jax arrays of shape (N, H, W).
    '''
    roi_mask = None
    if roi is not None:
        roi_np = np.asarray(roi)
        bbox = bbox_from_roi(roi_np)
        if bbox is not None:
            (y0, x0), (y1, x1) = bbox
            frames = frames[:, y0:y1, x0:x1]
            roi_mask = roi_np[y0:y1, x0:x1]
            if bground_im is not None:
                bground_im = np.asarray(bground_im)[y0:y1, x0:x1]
        else:
            roi_mask = roi_np

    return _prep_raw_frames_impl(
        jnp.asarray(frames),
        None if bground_im is None else jnp.asarray(bground_im),
        None if roi_mask is None else jnp.asarray(roi_mask),
        None if vmin is None else float(vmin),
        None if vmax is None else float(vmax),
        jnp.dtype(dtype).name, fix_invalid_pixels, fill_iterations)


def prep_raw_frames_host(frames: np.ndarray, bground_im=None, roi=None,
                         vmin=None, vmax=None, dtype='uint8') -> np.ndarray:
    '''Host (numpy) variant of :func:`prep_raw_frames` that defers the
    invalid-pixel fill to the device.

    Kinect dropout pixels (raw == 0) are encoded as the dtype's max value
    (a safe sentinel: valid values are clamped to ``vmax`` < max); the device
    side decodes + fills them (:func:`decode_prepped_frames`). Used when host
    -> device bandwidth is the bottleneck: uint8 output halves the transfer
    volume vs uploading raw uint16.
    '''
    frames = np.asarray(frames)

    # crop to the ROI bbox FIRST so every later pass touches less memory
    roi_crop = None
    if roi is not None:
        roi_np = np.asarray(roi)
        bbox = bbox_from_roi(roi_np)
        if bbox is not None:
            (y0, x0), (y1, x1) = bbox
            frames = frames[:, y0:y1, x0:x1]
            roi_crop = roi_np[y0:y1, x0:x1]
            if bground_im is not None:
                bground_im = np.asarray(bground_im)[y0:y1, x0:x1]
        else:
            roi_crop = roi_np

    out = _prep_frames_host_native(frames, bground_im, roi_crop, vmin, vmax,
                                   dtype)
    if out is not None:
        return out

    invalid = frames == 0

    # integer arithmetic end to end (depth values fit int32 comfortably)
    x = frames.astype('int32', copy=True)
    if bground_im is not None:
        np.subtract(np.asarray(bground_im, dtype='int32')[None], x, out=x)
    if roi_crop is not None:
        x *= roi_crop.astype('int32')
    if vmin is not None:
        x[x < int(np.ceil(vmin))] = 0
    info = np.iinfo(np.dtype(dtype))
    hi = int(vmax) if vmax is not None else info.max - 1
    np.clip(x, 0 if vmin is not None else info.min, min(hi, info.max - 1), out=x)
    out = x.astype(dtype)
    out[invalid] = info.max  # sentinel for the device-side fill
    return out


def _prep_frames_host_native(frames, bground_im, roi_crop, vmin, vmax,
                             dtype) -> 'np.ndarray | None':
    '''One-pass C++ core of :func:`prep_raw_frames_host` (bit-identical).

    The numpy path makes ~8 passes over the chunk; on the single-core
    extraction host that made the Read Depth stage the second-largest CPU
    cost. Returns None (caller falls back to numpy) when the input is not
    the production shape: uint16 frames, row-contiguous, uint8 output.
    '''
    if frames.dtype == np.int16 and frames.ndim == 3:
        # '<i2' is the reference's on-disk depth convention
        # (m2de/io/video.py read_frames_raw dtype default); physical depth
        # is nonnegative, where int16 bit-matches uint16 — a free view.
        # The min() scan (one SIMD pass) guards the theoretical negative.
        if frames.min() >= 0:
            frames = frames.view(np.uint16)
        else:
            return None
    if (np.dtype(dtype) != np.uint8 or frames.dtype != np.uint16
            or frames.ndim != 3 or frames.strides[2] != 2
            or frames.strides[1] < 0 or frames.strides[0] < 0):
        return None
    from moseq2_detectron_extract_tpu.native import load_prep_lib
    lib = load_prep_lib()
    if lib is None:
        return None
    import ctypes
    t, h, w = frames.shape
    bg = None if bground_im is None else \
        np.ascontiguousarray(bground_im, dtype=np.int32)
    roi32 = None if roi_crop is None else \
        np.ascontiguousarray(roi_crop, dtype=np.int32)
    hi = int(vmax) if vmax is not None else 254
    hi = min(hi, 254)
    out = np.empty((t, h, w), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.prep_frames_native(
        frames.ctypes.data_as(u8p),
        ctypes.c_long(frames.strides[0]), ctypes.c_long(frames.strides[1]),
        None if bg is None else bg.ctypes.data_as(i32p),
        None if roi32 is None else roi32.ctypes.data_as(i32p),
        ctypes.c_long(t), ctypes.c_long(h), ctypes.c_long(w),
        int(vmin is not None), 0 if vmin is None else int(np.ceil(vmin)),
        0, hi, 255,
        out.ctypes.data_as(u8p))
    return out if rc == 0 else None


@functools.partial(jax.jit, static_argnames=('fill_iterations',))
def decode_prepped_frames(frames: jnp.ndarray, fill_iterations: int = 16) -> jnp.ndarray:
    '''Decode sentinel-encoded prepped frames on device: sentinel pixels are
    treated as invalid and filled (inverse of :func:`prep_raw_frames_host`).'''
    sentinel = jnp.iinfo(frames.dtype).max
    invalid = frames == sentinel
    cleared = jnp.where(invalid, 0, frames)
    return fill_invalid_pixels(cleared, invalid, iterations=fill_iterations)


def fill_sentinels_host(frames: np.ndarray, sentinel: int) -> np.ndarray:
    '''Fill sentinel (dropout) pixels by row-carrying the previous valid
    value (falling back to the next valid / 0 for leading runs), in place.

    A cheap host-side stand-in for the device harmonic fill, used only to
    prepare frames for host-side resizing (the prescaled inference path):
    Kinect dropouts are 1-5px specks, where a row-carry is within noise of
    the reference's cv2.inpaint. Feature processing still uses the device
    harmonic fill on its windows.
    '''
    bad = frames == sentinel
    if not bad.any():
        return frames
    n, h, w = frames.shape
    flat = frames.reshape(n * h, w)
    badf = bad.reshape(n * h, w)
    # index of the most recent valid column per position (row-wise carry)
    idx = np.where(badf, 0, np.arange(w)[None, :])
    np.maximum.accumulate(idx, axis=1, out=idx)
    filled = np.take_along_axis(flat, idx, axis=1)
    # rows whose leading run is bad: carry the first valid value backward
    lead = badf[:, 0]
    if lead.any():
        first_valid = np.argmax(~badf[lead], axis=1)
        all_bad = badf[lead].all(axis=1)
        seed = flat[lead, np.where(all_bad, 0, first_valid)]
        seed = np.where(all_bad, 0, seed)
        lead_rows = np.flatnonzero(lead)
        for r, s in zip(lead_rows, seed):
            run = np.argmax(~badf[r]) if not badf[r].all() else w
            filled[r, :run] = s
    flat[badf] = filled[badf]
    return frames


def prescale_frames_host(frames: np.ndarray, cfg, vmin: float, vmax: float,
                         fill_sentinel=None) -> np.ndarray:
    '''ResizeShortestEdge + intensity scale on host -> (N, canvas, canvas)
    uint8, content in the top-left corner (the Predictor's prescaled path,
    models/predictor.py:predict_prescaled).

    Mirrors the device path's decode -> scale_raw_frames -> resize order:
    fill sentinels (row-carry), rescale [vmin, vmax] to the uint8 range,
    then cv2 INTER_LINEAR like the reference's host-side ResizeShortestEdge
    (Detectron2 resizes on host too). ~3-4x fewer H2D bytes than uploading
    full-res frames at production geometry. ``frames`` is not modified.
    '''
    import cv2
    n, h, w = frames.shape
    canvas = cfg.image_size
    scale = compute_test_scale(h, w, cfg.min_size_test, cfg.max_size_test)
    new_h = min(int(h * scale + 0.5), canvas)
    new_w = min(int(w * scale + 0.5), canvas)
    work = frames.copy()
    if fill_sentinel is not None:
        work = fill_sentinels_host(work, int(fill_sentinel))
    # scale_raw_frames parity: (x - vmin) * 255 / (vmax - vmin), uint8 wrap
    scaled = ((work.astype('float32') - float(vmin))
              * (255.0 / (float(vmax) - float(vmin)))).astype('uint8')
    out = np.zeros((n, canvas, canvas), np.uint8)
    if (new_h, new_w) == (h, w):
        out[:, :h, :w] = scaled
        return out
    for i in range(n):
        out[i, :new_h, :new_w] = cv2.resize(scaled[i], (new_w, new_h),
                                            interpolation=cv2.INTER_LINEAR)
    return out


def compute_test_scale(height: int, width: int, min_size: int, max_size: int) -> float:
    '''ResizeShortestEdge scale (shared with models/predictor.py).'''
    scale = min_size / min(height, width)
    if max(height, width) * scale > max_size:
        scale = max_size / max(height, width)
    return scale


def bbox_from_roi(roi: np.ndarray):
    '''Bounding box ((y0, x0), (y1, x1)) of positive mask pixels, end-exclusive.

    Returns None for an empty mask. Note: the reference (m2de/proc/roi.py:239-254
    + apply_roi :215-236) uses an end-INCLUSIVE max that it then slices with,
    dropping the last row/col; we keep that exact cropping behavior for parity.
    '''
    ys, xs = np.nonzero(np.asarray(roi) > 0)
    if len(ys) == 0:
        return None
    return (int(ys.min()), int(xs.min())), (int(ys.max()), int(xs.max()))


def apply_roi(frames: np.ndarray, roi: np.ndarray) -> np.ndarray:
    '''Mask frames by ``roi`` and crop to its bbox (m2de/proc/roi.py:215-236).'''
    frames = np.asarray(frames)
    roi = np.asarray(roi)
    if frames.ndim == 3:
        frames = frames * roi
    bbox = bbox_from_roi(roi)
    if bbox is not None:
        (y0, x0), (y1, x1) = bbox
        frames = frames[:, y0:y1, x0:x1] if frames.ndim == 3 else frames[y0:y1, x0:x1]
    return frames


@functools.partial(jax.jit, static_argnames=('dtype',))
def _scale_impl(frames, vmin, vmax, dtype):
    real = jnp.dtype(dtype)
    if jnp.issubdtype(real, jnp.integer):
        dmin, dmax = float(jnp.iinfo(real).min), float(jnp.iinfo(real).max)
    else:
        dmin, dmax = float(jnp.finfo(real).min), float(jnp.finfo(real).max)
    x = frames.astype(jnp.float32)
    return ((x - vmin) * ((dmax - dmin) / (vmax - vmin)) + dmin).astype(real)


def scale_raw_frames(frames, vmin: float, vmax: float, dtype='uint8'):
    '''Linear rescale of frames into the representable range of ``dtype``
    (m2de/proc/proc.py:214-234).'''
    return _scale_impl(jnp.asarray(frames), float(vmin), float(vmax), jnp.dtype(dtype).name)
