'''Pallas TPU kernel: fused frame cleaning (median blur + morphological open).

The extract hot path cleans every frame with a 3x3 median then a 9x9-ellipse
opening with 3 iterations (m2de/proc/proc.py:480-515, called at :716). As
separate XLA ops that is ~420 shifted min/max passes over HBM per chunk; this
kernel streams each frame tile into VMEM once, runs the whole stack on the
VPU, and writes the tile back — one HBM round trip total.

Border contract: the tile halo is zero-padded. For ROI-masked depth frames
(zero outside the arena) this is exactly equivalent to the cv2 semantics of
ops/morphology.py; for images with non-zero borders results differ only
within HALO pixels of the border. ``fused_clean_frames`` falls back to the
XLA ops implementation off-TPU.
'''
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moseq2_detectron_extract_tpu.ops.morphology import make_ellipse_strel

_TILE_H = 64
# needed halo: 1 (median3) + 4*3 (erode) + 4*3 (dilate) = 25; rounded up to 64
# so the DMA'd slab (TILE + 2*HALO = 192 rows, W + 128 lanes) meets mosaic's
# (8, 128) tiling alignment in both dimensions
_HALO = 64


def _ellipse_offsets():
    strel = np.asarray(make_ellipse_strel((9, 9))) > 0
    ys, xs = np.nonzero(strel)
    return tuple(zip((ys - 4).tolist(), (xs - 4).tolist()))


_OFFSETS = _ellipse_offsets()


def _window(x, dy, dx, h, w, halo):
    return x[halo + dy:halo + dy + h, halo + dx:halo + dx + w]


def _median3(x, h, w, halo):
    taps = [_window(x, dy, dx, h, w, halo)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    # median of 9 via an odd-even transposition network (mosaic has no sort)
    p = list(taps)
    for _ in range(9):
        for i in range(0, 8, 2):
            p[i], p[i + 1] = jnp.minimum(p[i], p[i + 1]), jnp.maximum(p[i], p[i + 1])
        for i in range(1, 8, 2):
            p[i], p[i + 1] = jnp.minimum(p[i], p[i + 1]), jnp.maximum(p[i], p[i + 1])
    return p[4]


def _erode(x, h, w, halo):
    out = None
    for dy, dx in _OFFSETS:
        tap = _window(x, dy, dx, h, w, halo)
        out = tap if out is None else jnp.minimum(out, tap)
    return out


def _dilate(x, h, w, halo):
    out = None
    for dy, dx in _OFFSETS:
        tap = _window(x, -dy, -dx, h, w, halo)
        out = tap if out is None else jnp.maximum(out, tap)
    return out


def _clean_kernel(in_hbm, out_ref, scratch, sem):
    n = pl.program_id(0)
    i = pl.program_id(1)
    tile_h = out_ref.shape[1]
    w = out_ref.shape[2]

    # stage the padded window (tile + halo on all sides) into VMEM
    copy = pltpu.make_async_copy(
        in_hbm.at[n, pl.ds(i * tile_h, tile_h + 2 * _HALO), :], scratch, sem)
    copy.start()
    copy.wait()

    # integer compute: order statistics only; mosaic lacks uint8<->f32 casts
    x = scratch[:].astype(jnp.int32)

    # the median consumes a 1px halo; each morphology iteration 4px more.
    # each stage computes the still-needed interior, shrinking to the tile:
    # margins 64 -> 24 -> 20 -> 16 -> 12 -> 8 -> 4 -> 0
    margin = _HALO

    def stage(fn, x, margin_out):
        nonlocal margin
        halo = margin - margin_out  # window offset = margin shrink per stage
        margin = margin_out
        return fn(x, tile_h + 2 * margin_out, w + 2 * margin_out, halo)

    x = stage(_median3, x, 24)
    x = stage(_erode, x, 20)
    x = stage(_erode, x, 16)
    x = stage(_erode, x, 12)
    x = stage(_dilate, x, 8)
    x = stage(_dilate, x, 4)
    x = stage(_dilate, x, 0)
    out_ref[0, :, :] = x.astype(out_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=('interpret',))
def _fused_clean_impl(frames, interpret=False):
    n, h, w = frames.shape
    tiles = pl.cdiv(h, _TILE_H)
    pad_h = tiles * _TILE_H - h
    wp = _round_up(w, 128)

    padded = jnp.pad(frames, ((0, 0), (_HALO, _HALO + pad_h),
                              (_HALO, _HALO + (wp - w))))

    out = pl.pallas_call(
        _clean_kernel,
        grid=(n, tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, _TILE_H, wp),
                               lambda ni, ti: (ni, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tiles * _TILE_H, wp), frames.dtype),
        scratch_shapes=[
            pltpu.VMEM((_TILE_H + 2 * _HALO, wp + 2 * _HALO), frames.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return out[:, :h, :w]


def fused_clean_frames(frames, interpret=None):
    '''Fused median3 + 9x9-ellipse opening (3 iters) over (N, H, W) frames.

    Equivalent to ``clean_frames(frames, iters_tail=3)`` for zero-bordered
    (ROI-masked) inputs. Uses the Pallas kernel on TPU; interpret mode
    elsewhere (tests).
    '''
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _fused_clean_impl(jnp.asarray(frames), interpret=interpret)
