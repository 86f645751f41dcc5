'''Device-side per-frame instance selection: mask-IoU NMS + centers of mass.

Replaces the per-frame host loop of
m2de/pipeline/process_features_step.py:63-160 with one batched program. Only
tiny tensors (keep flags, centers, scores) ever travel to the host, where the
sequential SORT-style tracker picks instance indices; the selected masks are
gathered on device.
'''
import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('iou_threshold',))
def nms_and_centers(masks, scores, valid, iou_threshold: float = 0.5):
    '''masks (N, D, H, W) bool; scores/valid (N, D).

    Returns (keep (N, D) bool after empty-mask filter + greedy mask-IoU NMS,
    centers (N, D, 2 [row, col]) float with NaN for empty masks).
    '''
    n, d, h, w = masks.shape
    m = masks.reshape(n, d, h * w).astype(jnp.float32)
    area = jnp.sum(m, axis=2)                     # (N, D)
    valid = valid & (area > 0)

    inter = jnp.einsum('ndp,nep->nde', m, m)
    union = area[:, :, None] + area[:, None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)

    # greedy NMS unrolled over the (small, static) D instances in score order
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf), axis=1)  # (N, D)

    def per_frame(frame_iou, frame_order, frame_valid):
        keep = jnp.zeros((d,), bool)
        for r in range(d):
            i = frame_order[r]
            suppressed = jnp.any(keep & (frame_iou[i] > iou_threshold))
            keep = keep.at[i].set(frame_valid[i] & ~suppressed)
        return keep

    keep = jax.vmap(per_frame)(iou, order, valid)

    ygrid = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(h * w)
    xgrid = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(h * w)
    safe_area = jnp.maximum(area, 1.0)
    cy = jnp.einsum('ndp,p->nd', m, ygrid) / safe_area
    cx = jnp.einsum('ndp,p->nd', m, xgrid) / safe_area
    centers = jnp.stack([cy, cx], axis=-1)
    centers = jnp.where((area > 0)[..., None], centers, jnp.nan)
    return keep, centers, iou


@jax.jit
def packbits_device(mask) -> jnp.ndarray:
    '''Pack a boolean (..., W) mask into (..., ceil(W/8)) uint8 on device
    (bitorder='big', np.unpackbits-compatible). Shrinks mask transfers 8x —
    significant when the device link is a low-bandwidth tunnel.'''
    w = mask.shape[-1]
    pad = (-w) % 8
    m = mask.astype(jnp.uint8)
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
    m = m.reshape(m.shape[:-1] + (-1, 8))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(m * weights, axis=-1, dtype=jnp.uint8)


def unpackbits_host(packed: 'jnp.ndarray', width: int):
    '''Inverse of :func:`packbits_device` (host numpy).'''
    import numpy as np
    arr = np.asarray(packed)
    bits = np.unpackbits(arr, axis=-1)
    return bits[..., :width]


@functools.partial(jax.jit, static_argnames=('crop',))
def pack_masks_cropped(masks, centers, crop: int = 128):
    '''Bit-pack only a ``crop`` x ``crop`` window around each mask's center.

    The full-resolution arena masks only feed the live preview's overlay,
    and a mouse occupies a tiny fraction of the arena — shipping the whole
    (N, H, W) bit-packed plane over a low-bandwidth tunnel dominated the
    crop stage (measured 2.5 s per 1000-frame chunk at 411px). The window
    (origin clamped into the frame) carries every set pixel as long as the
    blob fits in ``crop``; pixels outside it are dropped like the
    reference's overlay never drawing off-blob area.

    masks (N, H, W); centers (N, 2 [x, y]) float, NaN for empty frames.
    Returns (packed (N, crop, crop/8) uint8, origins (N, 2 [y0, x0]) int32).
    '''
    n, h, w = masks.shape
    cx = jnp.nan_to_num(centers[:, 0])
    cy = jnp.nan_to_num(centers[:, 1])
    x0 = jnp.clip(cx.astype(jnp.int32) - crop // 2, 0, max(w - crop, 0))
    y0 = jnp.clip(cy.astype(jnp.int32) - crop // 2, 0, max(h - crop, 0))

    def one(m, yy, xx):
        return jax.lax.dynamic_slice(m, (yy, xx), (crop, crop))

    crops = jax.vmap(one)(masks.astype(jnp.uint8), y0, x0)
    return packbits_device(crops > 0), jnp.stack([y0, x0], axis=-1)


def unpack_masks_cropped(packed, origins, frame_shape, crop: int = 128):
    '''Inverse of :func:`pack_masks_cropped`: full (N, H, W) uint8 masks.'''
    import numpy as np
    crops = unpackbits_host(np.asarray(packed), crop)
    origins = np.asarray(origins)
    h, w = frame_shape
    out = np.zeros((crops.shape[0], h, w), np.uint8)
    for i, (y0, x0) in enumerate(origins):
        out[i, y0:y0 + crop, x0:x0 + crop] = crops[i]
    return out


def window_origins(centers_xy, frame_shape, crop: int):
    '''(N, 2 [y0, x0]) int32 window origins for ``crop`` windows centered at
    ``centers_xy`` (x, y; NaN -> 0), clipped into ``frame_shape`` — numpy,
    shared by the device window gathers and the host window slicing so both
    sides agree exactly.

    Seed with the chosen detection's BOX center: the window then contains
    the whole detection box whenever the box fits ``crop``, and both the
    mask and the keypoints are produced inside the box — a mask-centroid
    seed has no such guarantee (an elongated animal's centroid sits in the
    body mass, pushing the tail beyond crop/2).
    '''
    import numpy as np
    h, w = frame_shape
    centers = np.nan_to_num(np.asarray(centers_xy, dtype='float64'))
    x0 = np.clip(centers[:, 0].astype('int32') - crop // 2, 0, max(w - crop, 0))
    y0 = np.clip(centers[:, 1].astype('int32') - crop // 2, 0, max(h - crop, 0))
    return np.stack([y0, x0], axis=-1).astype('int32')


@functools.partial(jax.jit, static_argnames=('crop',))
def gather_selected_windows(masks, keypoints, chosen_idx, has_instance,
                            origins, chunk, crop: int = 160):
    '''Gather one instance per frame AND slice ``crop`` windows at
    ``origins`` from both the selected mask and the raw depth chunk — one
    program, so the (N, D, H, W) mask tensor is read exactly once.

    The downstream feature stage (clean/moments/scalars/z-lookup) then runs
    on (N, crop, crop) windows instead of full frames: the animal occupies
    a tiny fraction of the arena (see :func:`window_origins` for the
    containment contract).

    masks (N, D, H, W); keypoints (N, D, K, 3); chosen_idx (N,) int32;
    has_instance (N,) bool; origins (N, 2 [y0, x0]) int32;
    chunk (N, H, W) depth. Returns (mask_wins (N, crop, crop) uint8,
    sel_keypoints (N, K, 3), chunk_wins (N, crop, crop)).
    '''
    sel_masks, sel_kpts = gather_selected(masks, keypoints, chosen_idx,
                                          has_instance)
    def one(m, c, o):
        return (jax.lax.dynamic_slice(m, (o[0], o[1]), (crop, crop)),
                jax.lax.dynamic_slice(c, (o[0], o[1]), (crop, crop)))

    mask_wins, chunk_wins = jax.vmap(one)(sel_masks, chunk, origins)
    return mask_wins, sel_kpts, chunk_wins


@functools.partial(jax.jit, static_argnames=('crop',))
def gather_selected_mask_windows(masks, keypoints, chosen_idx, has_instance,
                                 origins, crop: int = 160):
    '''As :func:`gather_selected_windows` but mask windows only — the
    prescaled pipeline slices its raw windows from the HOST chunk (there is
    no full-res depth on device in that mode).'''
    sel_masks, sel_kpts = gather_selected(masks, keypoints, chosen_idx,
                                          has_instance)

    def one(m, o):
        return jax.lax.dynamic_slice(m, (o[0], o[1]), (crop, crop))

    return jax.vmap(one)(sel_masks, origins), sel_kpts


@jax.jit
def gather_selected(masks, keypoints, chosen_idx, has_instance):
    '''Gather one instance per frame on device.

    masks (N, D, H, W); keypoints (N, D, K, 3); chosen_idx (N,) int32;
    has_instance (N,) bool. Returns (sel_masks (N, H, W) uint8,
    sel_keypoints (N, K, 3) with NaN rows where no instance).
    '''
    n = masks.shape[0]
    rows = jnp.arange(n)
    sel_masks = masks[rows, chosen_idx].astype(jnp.uint8)
    sel_masks = sel_masks * has_instance[:, None, None].astype(jnp.uint8)
    sel_kpts = keypoints[rows, chosen_idx].astype(jnp.float32)
    sel_kpts = jnp.where(has_instance[:, None, None], sel_kpts, jnp.nan)
    return sel_masks, sel_kpts
