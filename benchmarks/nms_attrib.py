'''Micro-attribution of the RPN proposal stage on the chip.

Times, slope-style (fori_loop at n=1 vs n=8, difference cancels dispatch/RTT):
  - per-level top-k only
  - top-k + decode/clip (no NMS)
  - full select_proposals, sequential lax.map over images
  - full select_proposals, map-of-vmap at group sizes 4/8/16

Usage: python benchmarks/nms_attrib.py [--batch 64]

Measured (v5e, batch 64, pre_k=1000/level, post_k=256):
  per-level top-k only          0.0007 s/batch  (85k fps)
  lax.map group=1 (shipped)     0.0143 s/batch  ( 4.5k fps)
  map-of-vmap group=4/8/16      0.0235 / 0.0208 / 0.0260 s/batch
Verdict: grouping is a regression — batching the O(P^2) IoU fixpoint
pushes the VPU into HBM-bound territory; the sequential per-image map
stays in VMEM. The shipped model keeps lax.map (models/rcnn.py).
The cost is in NMS decode+fixpoint, not top-k.
'''
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope_time(fn, *args, inner=8, lo=1):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=('n',))
    def loop(n, *a):
        def body(i, carry):
            out = fn(*jax.tree_util.tree_map(
                lambda x: x + carry * jnp.zeros((), x.dtype) if
                jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.ravel(leaf.astype(jnp.float32))[0] * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def one(n):
        np.asarray(loop(n, *args))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(one(inner) - one(lo), 1e-9) / (inner - lo)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=64)
    args = parser.parse_args()

    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from moseq2_detectron_extract_tpu.models.config import ModelConfig
    from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN
    from moseq2_detectron_extract_tpu.models.rpn import select_proposals

    cfg = ModelConfig()
    model = MaskKeypointRCNN(cfg)
    b = args.batch
    canvas = cfg.image_size

    # realistic logits/deltas/anchors: run the real backbone+rpn head once
    images = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (b, canvas, canvas, 3)).astype('float32'))
    image_sizes = jnp.tile(jnp.asarray([[240.0, 240.0]], jnp.float32), (b, 1))
    params = model.init(jax.random.PRNGKey(0), images[:1],
                        method=MaskKeypointRCNN.init_params)

    def rpn_out(self, images):
        feats = self._features(images)
        logits, deltas = self.rpn_head(feats)
        anchors = self._anchors([f.shape for f in feats])
        return feats, logits, deltas, anchors

    feats, logits, deltas, anchors = model.apply(params, images, method=rpn_out)
    logits = [jax.block_until_ready(l) for l in logits]
    deltas = [jax.block_until_ready(d) for d in deltas]
    pre_k, post_k = cfg.rpn_pre_nms_topk_test, cfg.rpn_post_nms_topk_test

    def per_image(img_logits, img_deltas, img_size):
        return select_proposals(anchors, img_logits, img_deltas,
                                (img_size[0], img_size[1]), pre_k, post_k,
                                cfg.rpn_nms_thresh, cfg.rpn_box_reg_weights)

    def topk_only(img_logits):
        outs = []
        for lvl in img_logits:
            flat = lvl.reshape(-1).astype(jnp.float32)
            k = min(pre_k, flat.shape[0])
            s, i = jax.lax.top_k(flat, k)
            outs.append(jnp.sum(s) + jnp.sum(i))
        return sum(outs)

    rows = []

    t = slope_time(lambda ls: jax.vmap(topk_only)(ls), logits)
    rows.append(('per-level top-k (vmap)', t))

    def seq(ls, ds, sz):
        bx, sc, va = jax.lax.map(
            lambda a: per_image(a[0], a[1], a[2]), (ls, ds, sz))
        return jnp.sum(bx) + jnp.sum(sc)
    t = slope_time(seq, logits, deltas, image_sizes)
    rows.append(('select_proposals lax.map (group=1)', t))

    for g in (4, 8, 16):
        if b % g:
            continue

        def grouped(ls, ds, sz, g=g):
            regroup = lambda x: x.reshape(b // g, g, *x.shape[1:])
            bx, sc, va = jax.lax.map(
                lambda a: jax.vmap(per_image)(a[0], a[1], a[2]),
                jax.tree_util.tree_map(regroup, (ls, ds, sz)))
            return jnp.sum(bx) + jnp.sum(sc)
        t = slope_time(grouped, logits, deltas, image_sizes)
        rows.append((f'select_proposals map-of-vmap group={g}', t))

    print(f'\nbatch={b} canvas={canvas} pre_k={pre_k}/level post_k={post_k}')
    print('| variant | s/batch | fps |')
    print('|---|---|---|')
    for name, t in rows:
        print(f'| {name} | {t:.4f} | {b / t:.0f} |')


if __name__ == '__main__':
    main()
