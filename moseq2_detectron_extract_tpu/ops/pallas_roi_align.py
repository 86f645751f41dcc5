'''Pallas TPU kernel: fused separable multilevel ROIAlign.

The XLA two-matmul formulation (``ops/roi_align.py:separable_batched_roi_align``)
is bound by the stage-1 intermediate T = Wy @ F_stack round-tripping HBM
(B*K*7*Wmax*C elements — 3.8 GB bf16 at the production box stage, ~6 ms of
pure write+read) and by stage-2's batched (7, W) @ (W, 7*C) matmuls. This
kernel fuses both stages per (image, ROI-block) grid cell so T lives only in
VMEM: stage 1 is a (BK*7, sum_l H_l) @ (sum_l H_l, Wmax*C) MXU matmul
against the level-stacked pyramid, stage 2 a BK-batched contraction over W.

VMEM discipline: the stacked pyramid (~3.9 MB bf16 at the 256-canvas
production shape) is kept in HBM and DMA'd ONCE per image into a persistent
scratch buffer (Pallas would double-buffer it as a grid input), and stage 1
runs in N-segments so only a (BK*7, seg) f32 accumulator is ever live —
results are downcast into a bf16 T scratch. Everything fits in ~11 MB.

Replaces the reference's Detectron2 CUDA ROIAlign for the inference path
(workload shape from /root/reference/moseq2_detectron_extract/model/config.py:30-56).
Falls back to the XLA formulation off-TPU. Inference-only: no custom VJP —
the training path uses the differentiable XLA formulations.
'''
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moseq2_detectron_extract_tpu.ops.roi_align import (_separable_inputs,
                                                        separable_batched_roi_align)

_N_SEG = 4


def _kernel(wy_ref, wx_ref, f_hbm, out_ref, f_vmem, t_vmem, sem, *,
            block_k, out_sz, c, wmax):
    bb = pl.program_id(0)
    kb = pl.program_id(1)

    # the image's stacked pyramid: DMA once, reuse across its ROI blocks
    @pl.when(kb == 0)
    def _():
        dma = pltpu.make_async_copy(f_hbm.at[bb], f_vmem, sem)
        dma.start()
        dma.wait()

    # stage 1 in N-segments: T[(i, oy), (w, c)] = sum_h Wy[(i, oy), h] * F[h, (w, c)]
    # (mosaic requires a 32-bit matmul accumulator; downcast per segment)
    wy = wy_ref[0]
    n = wmax * c
    seg = n // _N_SEG
    for j in range(_N_SEG):
        acc = jnp.dot(wy, f_vmem[:, j * seg:(j + 1) * seg],
                      preferred_element_type=jnp.float32)
        t_vmem[:, j * seg:(j + 1) * seg] = acc.astype(t_vmem.dtype)

    # stage 2: out[i, oy, ox, cc] = sum_w T[i, oy, w, cc] * Wx[i, ox, w].
    # T is the LHS so the matmul's free/M side is (oy, C) — full sublane
    # occupancy — instead of Wx's M=out (7/128 rows, measured 0.7% MXU
    # efficiency). A/B of 3 formulations in benchmarks/roi_stage2_exp.py:
    # wx-lhs 28.2 ms, block-diagonal retile 18.1 ms, this one 16.1 ms at
    # the production box-stage shape.
    t = t_vmem[:].reshape(block_k, out_sz, wmax, c)
    r = jax.lax.dot_general(t, wx_ref[0], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    out_ref[0] = jnp.transpose(r, (0, 1, 3, 2)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('output_size', 'min_level',
                                             'block_k', 'interpret',
                                             'out_dtype'))
def _pallas_impl(features, boxes, output_size, min_level, block_k, interpret,
                 out_dtype):
    b, k = boxes.shape[:2]
    c = features[0].shape[-1]
    f_mat, wy, wx = _separable_inputs(features, boxes, output_size, min_level)
    h_total, wmax = wy.shape[-1], wx.shape[-1]
    out_sz = output_size
    dtype = f_mat.dtype

    # the per-image pyramid DMA slices f_hbm along H, which Mosaic requires
    # sublane-aligned; h_total is 120 at the 256 canvas but e.g. 90 at 192 —
    # zero-pad the stacked height (zero rows contribute nothing to stage 1)
    hpad = (-h_total) % 8
    if hpad:
        f_mat = jnp.pad(f_mat, ((0, 0), (0, hpad), (0, 0)))
        wy = jnp.pad(wy, ((0, 0), (0, 0), (0, 0), (0, hpad)))
        h_total += hpad

    pad = (-k) % block_k
    if pad:
        wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = k + pad
    wy = wy.reshape(b, kp * out_sz, h_total)

    kernel = functools.partial(_kernel, block_k=block_k, out_sz=out_sz,
                               c=c, wmax=wmax)
    # grid: ROI blocks innermost so the image's pyramid scratch stays valid
    pooled = pl.pallas_call(
        kernel,
        grid=(b, kp // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k * out_sz, h_total),
                         lambda bb, kb: (bb, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, out_sz, wmax),
                         lambda bb, kb: (bb, kb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, block_k, out_sz, out_sz, c),
                               lambda bb, kb: (bb, kb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kp, out_sz, out_sz, c),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((h_total, wmax * c), dtype),
            pltpu.VMEM((block_k * out_sz, wmax * c), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # block_k=16 at the box stage puts ~12 MB in VMEM (pyramid + T
        # scratches + f32 out block + stage-2 intermediates); raise the
        # 16 MB default scoped limit so the compiler has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(wy, wx, f_mat)
    return pooled[:, :k]


def pallas_separable_roi_align(features, boxes, output_size: int,
                               min_level: int = 2, block_k=None,
                               interpret=None, out_dtype=jnp.float32):
    '''Fused-kernel multilevel ROIAlign: (B, K, 4) boxes over batched FPN
    levels (B, H_l, W_l, C) -> (B, K, out, out, C) float32.

    Matches ``batched_multilevel_roi_align`` semantics (ROIAlignV2,
    sampling_ratio=2) at bf16 matmul precision. ``block_k`` must keep
    block_k*output_size a multiple of 8 (sublane tiling); the default
    scales inversely with output_size (8 at the 7x7 box stage, 4 at the
    14x14 keypoint stage) to keep the T scratch + f32 out blocks inside
    the 16 MB scoped-VMEM limit at the production 256-canvas shape.
    Off-TPU this dispatches to the XLA separable formulation instead of
    interpret mode — same algebra, far faster in tests.

    Measured v5e, batch 64 x 256 ROIs, C=256, canvas 256 (slope-timed):
    gather path 108 ms -> XLA separable 29 ms -> fused kernel 25.5 ms ->
    16.1 ms after the stage-2 operand swap (T as LHS: M=(oy, C) full
    sublane occupancy vs the original Wx-LHS M=7, which ran at 0.7% MXU
    efficiency, ~9.7 us of the 12.5 us block). Formulation A/B in
    benchmarks/roi_stage2_exp.py (block-diagonal retile and Mosaic
    4-D-transpose variants both lose to the operand swap).
    '''
    if interpret is None:
        if jax.default_backend() != 'tpu':
            return separable_batched_roi_align(
                features, boxes, output_size,
                min_level=min_level).astype(out_dtype)
        interpret = False
    if block_k is None:
        block_k = 16 if output_size <= 7 else 4
    return _pallas_impl(tuple(features), boxes, output_size, min_level,
                        block_k, interpret, jnp.dtype(out_dtype))
