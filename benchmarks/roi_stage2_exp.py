'''Experiment: stage-2 formulations of the fused Pallas separable ROIAlign.

The production kernel's stage 2 (per-ROI (7, W) @ (W, 7C) batched matmuls)
runs at M=7 — ~5% MXU row occupancy — and is ~9.7 us of the ~12.5 us block
(benchmarks/DEVICE_ATTRIB.md). Variants measured here at the production box
stage shape (batch 64 x 256 ROIs, canvas 256, C=256):

  base      — the shipping kernel (ops/pallas_roi_align.py)
  blockdiag — expand Wx to a block-diagonal (bk*7, bk*W) matrix and run ONE
              M=bk*7 matmul against a (bk*W, 7C) transposed T
  dotswap   — dot_general with (oy, c) as the lhs free dims (M=1792, N=7)

Correctness is asserted against the XLA separable formulation on CPU
(interpret mode) before any timing.
'''
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from moseq2_detectron_extract_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moseq2_detectron_extract_tpu.ops.roi_align import (_separable_inputs,
                                                        separable_batched_roi_align)
from moseq2_detectron_extract_tpu.ops.pallas_roi_align import (_N_SEG,
                                                               pallas_separable_roi_align)


def _stage1(wy_ref, f_vmem, t_vmem):
    wy = wy_ref[0]
    n = t_vmem.shape[-1]
    seg = n // _N_SEG
    for j in range(_N_SEG):
        acc = jnp.dot(wy, f_vmem[:, j * seg:(j + 1) * seg],
                      preferred_element_type=jnp.float32)
        t_vmem[:, j * seg:(j + 1) * seg] = acc.astype(t_vmem.dtype)


def _blockdiag_wx(wx2, block_k, out_sz, wmax):
    '''flat (bk*out, wmax) -> block-diagonal (bk*out, bk*wmax), 2-D ops only
    (the host pre-flattens wx: Mosaic rejects the 3-D->2-D reshape in-kernel).'''
    tiled = jnp.concatenate([wx2] * block_k, axis=1)   # (bk*out, bk*wmax)
    r_i = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 0) // out_sz
    c_i = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 1) // wmax
    return jnp.where(r_i == c_i, tiled, jnp.zeros((), tiled.dtype))


def _kernel_retile_peroy(wy_ref, wx_ref, f_hbm, out_ref, f_vmem, t_vmem,
                         tw_vmem, sem, *, block_k, out_sz, c, wmax):
    '''Block-diagonal stage 2 built from lane-slices only: retile T into
    (w, (i, oy), c) with wmax slab writes, then per-oy one M=bk*out matmul
    against a concat of per-ROI w-bands.'''
    bb = pl.program_id(0)
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        dma = pltpu.make_async_copy(f_hbm.at[bb], f_vmem, sem)
        dma.start()
        dma.wait()

    _stage1(wy_ref, f_vmem, t_vmem)

    # retile: lane-slice each w's (bk*out, c) slab out of T's (w, c)-flat
    # columns (no lane<->sublane relayout; every piece keeps rows x c-lanes)
    for wb in range(wmax):
        tw_vmem[wb] = t_vmem[:, wb * c:(wb + 1) * c]

    wtil = _blockdiag_wx(wx_ref[0], block_k, out_sz, wmax)
    for oy in range(out_sz):
        rhs = jnp.concatenate(
            [tw_vmem[:, i * out_sz + oy, :] for i in range(block_k)], axis=0)
        r = jnp.dot(wtil, rhs, preferred_element_type=jnp.float32)
        # per-ROI sublane slices: Mosaic rejects the (bk*out, c)->(bk, out, c)
        # shape cast, so write each ROI's (out, c) slab separately
        for i in range(block_k):
            out_ref[0, i, oy] = r[i * out_sz:(i + 1) * out_sz].astype(
                out_ref.dtype)


def _kernel_transpose(wy_ref, wx_ref, f_hbm, out_ref, f_vmem, t_vmem, sem, *,
                      block_k, out_sz, c, wmax):
    '''Let Mosaic do the 4-D transpose + flatten, then one block-diag matmul.'''
    bb = pl.program_id(0)
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        dma = pltpu.make_async_copy(f_hbm.at[bb], f_vmem, sem)
        dma.start()
        dma.wait()

    _stage1(wy_ref, f_vmem, t_vmem)

    t = t_vmem[:].reshape(block_k, out_sz, wmax, c)
    tt = jnp.transpose(t, (0, 2, 1, 3)).reshape(block_k * wmax, out_sz * c)
    wtil = _blockdiag_wx(wx_ref[0], block_k, out_sz, wmax)
    r = jnp.dot(wtil, tt, preferred_element_type=jnp.float32)
    r = r.reshape(block_k, out_sz, out_sz, c)          # (i, ox, oy, c)
    out_ref[0] = jnp.swapaxes(r, 1, 2).astype(out_ref.dtype)


def _kernel_dotswap(wy_ref, wx_ref, f_hbm, out_ref, f_vmem, t_vmem, sem, *,
                    block_k, out_sz, c, wmax):
    bb = pl.program_id(0)
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        dma = pltpu.make_async_copy(f_hbm.at[bb], f_vmem, sem)
        dma.start()
        dma.wait()

    _stage1(wy_ref, f_vmem, t_vmem)

    t = t_vmem[:].reshape(block_k, out_sz, wmax, c)
    r = jax.lax.dot_general(t, wx_ref[0], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    out_ref[0] = jnp.transpose(r, (0, 1, 3, 2)).astype(out_ref.dtype)


def _kernel_noxpose(wy_ref, wx_ref, f_hbm, out_ref, f_vmem, t_vmem, sem, *,
                    block_k, out_sz, c, wmax):
    '''dotswap WITHOUT the in-kernel lane transpose: the dot_general result
    (i, oy, c, ox) is written as-is; consumers handle the permuted layout
    (the box head's flatten->FC only needs its weight rows permuted).'''
    bb = pl.program_id(0)
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        dma = pltpu.make_async_copy(f_hbm.at[bb], f_vmem, sem)
        dma.start()
        dma.wait()

    _stage1(wy_ref, f_vmem, t_vmem)

    t = t_vmem[:].reshape(block_k, out_sz, wmax, c)
    r = jax.lax.dot_general(t, wx_ref[0], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    out_ref[0] = r.astype(out_ref.dtype)


def make_variant(kernel_fn, block_k, out_dtype=jnp.float32):
    permuted = kernel_fn is _kernel_noxpose

    @functools.partial(jax.jit, static_argnames=('output_size', 'min_level',
                                                 'interpret'))
    def impl(features, boxes, output_size, min_level=2, interpret=False):
        b, k = boxes.shape[:2]
        c = features[0].shape[-1]
        f_mat, wy, wx = _separable_inputs(features, boxes, output_size, min_level)
        h_total, wmax = wy.shape[-1], wx.shape[-1]
        out_sz = output_size
        dtype = f_mat.dtype
        pad = (-k) % block_k
        if pad:
            wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
            wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kp = k + pad
        wy = wy.reshape(b, kp * out_sz, h_total)
        if kernel_fn not in (_kernel_dotswap, _kernel_noxpose):
            # block-diag variants get wx pre-flattened: Mosaic rejects the
            # (bk, out, wmax) -> (bk*out, wmax) shape cast in-kernel
            wx = wx.reshape(b, kp * out_sz, wmax)
            wx_spec = pl.BlockSpec((1, block_k * out_sz, wmax),
                                   lambda bb, kb: (bb, kb, 0),
                                   memory_space=pltpu.VMEM)
        else:
            wx_spec = pl.BlockSpec((1, block_k, out_sz, wmax),
                                   lambda bb, kb: (bb, kb, 0, 0),
                                   memory_space=pltpu.VMEM)
        kernel = functools.partial(kernel_fn, block_k=block_k, out_sz=out_sz,
                                   c=c, wmax=wmax)
        pooled = pl.pallas_call(
            kernel,
            grid=(b, kp // block_k),
            in_specs=[
                pl.BlockSpec((1, block_k * out_sz, h_total),
                             lambda bb, kb: (bb, kb, 0), memory_space=pltpu.VMEM),
                wx_spec,
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, block_k, out_sz, c, out_sz) if permuted else
                (1, block_k, out_sz, out_sz, c),
                lambda bb, kb: (bb, kb, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (b, kp, out_sz, c, out_sz) if permuted else
                (b, kp, out_sz, out_sz, c), out_dtype),
            scratch_shapes=(
                [pltpu.VMEM((h_total, wmax * c), dtype),
                 pltpu.VMEM((block_k * out_sz, wmax * c), dtype)]
                + ([pltpu.VMEM((wmax, block_k * out_sz, c), dtype)]
                   if kernel_fn is _kernel_retile_peroy else [])
                + [pltpu.SemaphoreType.DMA]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(wy, wx, f_mat)
        return pooled[:, :k]

    return impl


def make_inputs(b=64, k=256, c=256, canvas=256, seed=0):
    rng = np.random.default_rng(seed)
    feats = []
    for lvl in range(2, 6):
        s = canvas // (2 ** lvl)
        feats.append(jnp.asarray(rng.normal(0, 1, (b, s, s, c)), jnp.bfloat16))
    centers = rng.uniform(30, canvas - 30, (b, k, 2))
    sizes = rng.uniform(8, 180, (b, k, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=-1)
    boxes = np.clip(boxes, 0, canvas - 1)
    return tuple(feats), jnp.asarray(boxes, jnp.float32)


def timed_slope(program, args, inner=6, lo=1):
    @functools.partial(jax.jit, static_argnames=('n',))
    def loop(a, n):
        def body(i, carry):
            out = program(a[0], a[1] + carry * 1e-30)
            tot = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
            return tot
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def one(n):
        np.asarray(loop(args, n))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = one(lo), one(inner)
    return max(t_hi - t_lo, 1e-9) / (inner - lo)


def main():
    on_tpu = jax.default_backend() == 'tpu'
    out_sz = 7

    # correctness first, small shape. canvas must keep h_total = sum of
    # level heights a multiple of 8 (sublane tiling of the f_mat DMA slice):
    # 256 -> 64+32+16+8 = 120. canvas 128 gives 60 and Mosaic rejects it.
    feats_s, boxes_s = make_inputs(b=2, k=16, c=128, canvas=256, seed=1)
    ref = np.asarray(separable_batched_roi_align(feats_s, boxes_s, out_sz))
    for name, kern, dt in (('retile', _kernel_retile_peroy, jnp.float32),
                           ('transpose', _kernel_transpose, jnp.float32),
                           ('dotswap', _kernel_dotswap, jnp.float32),
                           ('noxpose', _kernel_noxpose, jnp.float32),
                           ('noxpose-bf16', _kernel_noxpose, jnp.bfloat16)):
        impl = make_variant(kern, block_k=8, out_dtype=dt)
        got = np.asarray(impl(feats_s, boxes_s, out_sz,
                              interpret=not on_tpu), np.float32)
        if kern is _kernel_noxpose:
            got = got.transpose(0, 1, 2, 4, 3)  # (b,k,oy,c,ox)->(b,k,oy,ox,c)
        err = np.max(np.abs(got - ref))
        print(f'{name}: max abs err vs XLA separable = {err:.5f}')
        assert err < 0.05, name

    if not on_tpu:
        print('CPU correctness done; timing requires the chip')
        return

    feats, boxes = make_inputs()
    print(f'\nbox-stage shape: 64x256 ROIs, canvas 256, C=256, out {out_sz}')
    base = timed_slope(lambda f, bx: pallas_separable_roi_align(f, bx, out_sz),
                       (feats, boxes))
    print(f'  {"base (shipping)":18s} block_k=  8  {base * 1e3:7.2f} ms/batch',
          flush=True)
    for name, kern, dt in (('retile', _kernel_retile_peroy, jnp.float32),
                           ('transpose', _kernel_transpose, jnp.float32),
                           ('dotswap', _kernel_dotswap, jnp.float32),
                           ('noxpose', _kernel_noxpose, jnp.float32),
                           ('noxpose-bf16', _kernel_noxpose, jnp.bfloat16)):
        for bk in (8, 16):
            impl = make_variant(kern, bk, out_dtype=dt)
            try:
                t = timed_slope(
                    lambda f, bx, impl=impl: impl(f, bx, out_sz),
                    (feats, boxes))
            except Exception as e:  # compile/vmem failures: report, continue
                print(f'  {name:18s} block_k={bk:3d}  FAILED: '
                      f'{str(e).splitlines()[0][:120]}', flush=True)
                continue
            print(f'  {name:18s} block_k={bk:3d}  {t * 1e3:7.2f} ms/batch',
                  flush=True)


if __name__ == '__main__':
    main()
