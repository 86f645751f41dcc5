'''block_k sweep of the fused Pallas ROIAlign at the deployed box-stage shape.

Stage 1's matmul M-side is block_k * out_sz rows (112 at the shipping
block_k=16): raising block_k doubles/quadruples the M occupancy per grid
cell and halves the grid (fewer stage-2 dispatch tails), at the cost of
larger T/out VMEM blocks. Slope-timed (RTT-immune) on the chip at the
faithful budget (batch 64, 128 ROIs, 7x7, C=256, canvas 256).

Run on the chip: python benchmarks/roi_blockk_sweep.py

Measured 2026-08-20 (v5e, batch 64 x 128 ROIs, 7x7, C=256, canvas 256,
bf16 out): block_k 8 -> 7.70 ms, **16 -> 6.98 ms (shipping, best)**,
32 -> 7.31 ms, 64 -> Mosaic compile failure (VMEM). The M-occupancy gain
beyond 112 rows does not pay for the larger T/out VMEM blocks — negative
result, shipping default stays 16.
'''
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from moseq2_detectron_extract_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.ops.pallas_roi_align import \
    pallas_separable_roi_align


def timed_slope(program, args, inner=8, lo=1):
    @functools.partial(jax.jit, static_argnames=('n',))
    def loop(a, n):
        def body(i, carry):
            out = program(*jax.tree_util.tree_map(
                lambda x: x + carry * 1e-30 if x.dtype.kind == 'f' else x, a))
            return jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def one(n):
        np.asarray(loop(args, n))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (one(inner) - one(lo)) / (inner - lo)


def main():
    # env overrides: sweep at other deployed shapes (e.g. the fast160
    # variant: SWEEP_K=48 SWEEP_CANVAS=160 SWEEP_BLOCKS=8,16,24,48)
    b = int(os.environ.get('SWEEP_B', 64))
    k = int(os.environ.get('SWEEP_K', 128))
    c = int(os.environ.get('SWEEP_C', 256))
    canvas = int(os.environ.get('SWEEP_CANVAS', 256))
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, (
        b, canvas // (4 * 2 ** l), canvas // (4 * 2 ** l), c)
    ).astype(np.float32)).astype(jnp.bfloat16) for l in range(4)]
    r = canvas / 256.0  # box distribution scales with the canvas
    cx = rng.uniform(20 * r, 220 * r, (b, k))
    cy = rng.uniform(20 * r, 220 * r, (b, k))
    wh = rng.uniform(10 * r, 120 * r, (b, k, 2))
    boxes = jnp.asarray(np.stack(
        [cx - wh[..., 0] / 2, cy - wh[..., 1] / 2,
         cx + wh[..., 0] / 2, cy + wh[..., 1] / 2], -1).astype('float32'))

    blocks = tuple(int(x) for x in os.environ.get(
        'SWEEP_BLOCKS', '8,16,32,64').split(','))
    out = {}
    ref = None
    for block_k in blocks:
        try:
            dt = timed_slope(
                lambda f, bx: pallas_separable_roi_align(
                    [f0 for f0 in f], bx, 7, block_k=block_k,
                    out_dtype=jnp.bfloat16),
                (feats, boxes))
            res = np.asarray(pallas_separable_roi_align(
                feats, boxes, 7, block_k=block_k,
                out_dtype=jnp.float32))
            if ref is None:
                ref = res
            delta = float(np.abs(res - ref).max())
            out[f'block_k_{block_k}'] = {'ms': round(dt * 1000, 2),
                                         'max_delta_vs_first': delta}
        except Exception as exc:  # noqa: BLE001
            out[f'block_k_{block_k}'] = f'failed: {str(exc)[:150]}'
        print(json.dumps({f'block_k_{block_k}': out[f'block_k_{block_k}']}),
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
