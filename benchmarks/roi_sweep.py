'''Honest sweep of the box-stage ROIAlign pooling on the chip.

Times batched_multilevel_roi_align at the production inference shape
(batch 64 x 256 proposals, canvas 256, C=256) across chunk sizes and
gather dtypes, using the slope method from device_attrib (two in-loop
repetition counts; cancels tunnel RTT / dispatch exactly).
'''
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from moseq2_detectron_extract_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.ops.roi_align import batched_multilevel_roi_align


def timed_slope(program, args, inner=6, lo=1):
    @functools.partial(jax.jit, static_argnames=('n',))
    def loop(a, n):
        def body(i, carry):
            out = program(*jax.tree_util.tree_map(
                lambda x: (x + carry * 1e-30).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.ravel(leaf.astype(jnp.float32))[0]
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
    b, k, c = 64, 256, 256
    canvas = 256
    rng = np.random.default_rng(0)
    feats = []
    for lvl in range(4):
        s = canvas // (4 * 2 ** lvl)
        feats.append(jnp.asarray(rng.normal(0, 1, (b, s, s, c)).astype('float32')))
    # mouse-like boxes ~80px
    cx = rng.uniform(60, 180, (b, k))
    cy = rng.uniform(60, 180, (b, k))
    wh = rng.uniform(40, 100, (b, k, 2))
    boxes = jnp.asarray(np.stack([cx - wh[..., 0] / 2, cy - wh[..., 1] / 2,
                                  cx + wh[..., 0] / 2, cy + wh[..., 1] / 2],
                                 axis=-1).astype('float32'))

    print(f'backend={jax.default_backend()} B={b} K={k} C={c} canvas={canvas}')
    for dtype in ('float32', 'bfloat16'):
        fcast = tuple(f.astype(dtype) for f in feats)
        for chunk in (128, 256, 512, 1024, 2048):
            def prog(bx, *fs, _chunk=chunk):
                return batched_multilevel_roi_align(fs, bx, 7, chunk=_chunk)
            dt = timed_slope(prog, (boxes,) + fcast)
            total_fps = b / dt
            print(f'dtype={dtype:9s} chunk={chunk:5d}  {dt * 1e3:8.2f} ms '
                  f'({total_fps:7.1f} img/s)', flush=True)


if __name__ == '__main__':
    main()
