'''Per-stage attribution of the inference device program.

Times cumulative prefixes of the Mask+Keypoint R-CNN forward (preprocess,
backbone+FPN, RPN head, proposal NMS, box stage, mask stage, keypoint stage,
full predictor step) on the real chip; stage cost = delta between successive
prefixes. Also prints XLA ``cost_analysis`` FLOPs and the implied MFU.

Usage: python benchmarks/device_attrib.py [--batch 64] [--frame 404]
Writes a markdown table to stdout and benchmarks/DEVICE_ATTRIB.md.
'''
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, reps=10):
    '''Wall time per rep with a forced D2H sync of one scalar per rep — on
    the tunneled 'axon' backend, block_until_ready alone does NOT reliably
    wait for execution (measured: backbone "runs" below its speed-of-light
    floor), so every rep round-trips a scalar instead.'''
    import jax
    import jax.numpy as jnp

    def scalarize(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(jnp.ravel(leaf)[0])

    scalarize(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        scalarize(fn(*args))
    return (time.perf_counter() - t0) / reps


def timed_device_loop(program, params, images, sizes, inner=8, lo=1):
    '''Pure device time per call, immune to tunnel RTT and async-dispatch
    artifacts: run ``program`` n times INSIDE one jitted fori_loop (each
    iteration depends on the previous via an epsilon input perturbation, so
    XLA cannot hoist or dedupe), at n=lo and n=inner; the slope
    (t_hi - t_lo) / (inner - lo) cancels every fixed cost (RTT, dispatch,
    D2H of the result scalar) exactly.

    The carry folds in EVERY output leaf: an earlier version carried only
    ``tree_leaves(out)[0]``, which let XLA dead-code-eliminate the mask /
    keypoint heads, full-res paste and fused select out of the timed
    program and report ~1000 fps for a program that really sustains ~270
    (verified against isolated top-level dispatches and back-to-back
    queued executions, all ~0.237 s/batch-64).'''
    import functools
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=('n',))
    def loop(p, x, s, n):
        def body(i, carry):
            out = program(p, x + carry * 1e-30, s)
            tot = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
            return tot
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def one(n):
        np.asarray(loop(params, images, sizes, n))  # compile + warmup
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(params, images, sizes, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = one(lo), one(inner)
    return max(t_hi - t_lo, 1e-9) / (inner - lo)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--frame', type=int, default=404,
                        help='square input frame size (ROI bbox side)')
    parser.add_argument('--dets', type=int, default=1)
    parser.add_argument('--reps', type=int, default=10)
    parser.add_argument('--topk', type=int, default=128,
                        help='rpn_post_nms_topk_test (deployed bench-model '
                             'setting; benchmarks/PROPOSAL_AB.md)')
    parser.add_argument('--cap', type=int, default=512,
                        help='rpn_nms_global_cap (deployed bench-model setting)')
    parser.add_argument('--canvas', type=int, default=256,
                        help='model canvas (image_size); test sizes scale '
                             'with it like benchmarks/train_bench_model.py')
    parser.add_argument('--out', default='DEVICE_ATTRIB.md',
                        help='output markdown filename (under benchmarks/)')
    args = parser.parse_args()

    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from moseq2_detectron_extract_tpu.models.config import ModelConfig
    from moseq2_detectron_extract_tpu.models.predictor import Predictor
    from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN

    ratio = args.canvas / 256.0
    view = int(240 * ratio)
    cfg = ModelConfig(test_detections_per_image=args.dets,
                      rpn_post_nms_topk_test=args.topk,
                      rpn_nms_global_cap=args.cap,
                      image_size=args.canvas,
                      min_size_test=view,
                      max_size_test=int(250 * ratio))
    model = MaskKeypointRCNN(cfg)
    b = args.batch
    canvas = cfg.image_size
    images = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (b, canvas, canvas, 3)).astype('float32'))
    image_sizes = jnp.tile(
        jnp.asarray([[float(view), float(view)]], jnp.float32), (b, 1))
    params = model.init(jax.random.PRNGKey(0), images[:1],
                        method=MaskKeypointRCNN.init_params)

    # cumulative prefixes of the inference forward; each returns a small
    # reduction so D2H cost does not pollute the timing
    def pfx_backbone(self, images, image_sizes):
        feats = self._features(images)
        return [jnp.sum(f.astype(jnp.float32)) for f in feats]

    def pfx_rpn_head(self, images, image_sizes):
        feats = self._features(images)
        logits, deltas = self.rpn_head(feats)
        return ([jnp.sum(l.astype(jnp.float32)) for l in logits]
                + [jnp.sum(d.astype(jnp.float32)) for d in deltas])

    def pfx_proposals(self, images, image_sizes):
        feats = self._features(images)
        boxes, scores, valid, _ = self._proposals(feats, image_sizes, False)
        return jnp.sum(boxes), jnp.sum(scores)

    def pfx_box_pool(self, images, image_sizes):
        feats = self._features(images)
        boxes, scores, valid, _ = self._proposals(feats, image_sizes, False)
        pooled = self._pool(feats, boxes, self.cfg.box_pooler_resolution)
        return jnp.sum(pooled)

    # finer tail prefixes (VERDICT r4 item 6: box stage + detection tail are
    # ~half the fast160 program; split them into head / select / mask / kp).
    # These replicate models/rcnn.py:inference piecewise — benchmark-only
    # scaffolding, asserted against nothing but used for stage deltas.
    def _through_box_head(self, feats, image_sizes):
        from moseq2_detectron_extract_tpu.ops.boxes import (clip_boxes,
                                                            decode_boxes)
        cfg = self.cfg
        proposals, _, prop_valid, _ = self._proposals(feats, image_sizes,
                                                      False)
        b, p = proposals.shape[0], proposals.shape[1]
        pooled = self._pool(feats, proposals, cfg.box_pooler_resolution)
        cls_logits, box_deltas = self.box_head(
            pooled.reshape(b * p, *pooled.shape[2:]))
        cls_logits = cls_logits.reshape(b, p, -1).astype(jnp.float32)
        box_deltas = box_deltas.reshape(b, p, 4).astype(jnp.float32)
        probs = jax.nn.softmax(cls_logits, axis=-1)
        boxes = decode_boxes(box_deltas, proposals, cfg.box_reg_weights)
        return boxes, probs[..., 0], prop_valid

    def pfx_box_head(self, images, image_sizes):
        feats = self._features(images)
        boxes, scores, valid = _through_box_head(self, feats, image_sizes)
        return jnp.sum(boxes), jnp.sum(scores)

    def _through_select(self, feats, image_sizes):
        from moseq2_detectron_extract_tpu.ops.boxes import clip_boxes
        from moseq2_detectron_extract_tpu.ops.nms import batched_nms_keep_mask
        cfg = self.cfg
        boxes, fg_scores, prop_valid = _through_box_head(self, feats, image_sizes)

        def per_image_select(img_boxes, img_scores, img_valid, img_size):
            img_boxes = clip_boxes(img_boxes, (img_size[0], img_size[1]))
            valid = img_valid & (img_scores > cfg.test_score_thresh)
            keep = batched_nms_keep_mask(
                img_boxes, img_scores,
                jnp.zeros(img_boxes.shape[0], jnp.int32),
                cfg.test_nms_thresh, valid=valid)
            masked = jnp.where(keep, img_scores, -jnp.inf)
            top_scores, top_idx = jax.lax.top_k(
                masked, cfg.test_detections_per_image)
            det_valid = jnp.isfinite(top_scores)
            det_boxes = jnp.where(det_valid[:, None], img_boxes[top_idx], 0.0)
            return det_boxes, jnp.where(det_valid, top_scores, 0.0), det_valid

        return jax.vmap(per_image_select)(boxes, fg_scores, prop_valid,
                                          image_sizes)

    def pfx_det_select(self, images, image_sizes):
        feats = self._features(images)
        det_boxes, det_scores, det_valid = _through_select(self, feats, image_sizes)
        return jnp.sum(det_boxes), jnp.sum(det_scores)

    def pfx_mask_stage(self, images, image_sizes):
        from moseq2_detectron_extract_tpu.models.heads import paste_masks
        cfg = self.cfg
        feats = self._features(images)
        det_boxes, det_scores, det_valid = _through_select(self, feats, image_sizes)
        canvas = (images.shape[1], images.shape[2])
        b, d = det_boxes.shape[0], det_boxes.shape[1]
        mask_pooled = self._pool(feats, det_boxes, cfg.mask_pooler_resolution)
        mask_logits = self.mask_head(
            mask_pooled.reshape(b * d, *mask_pooled.shape[2:]))
        mask_logits = mask_logits[..., 0].reshape(b, d, cfg.mask_resolution,
                                                  cfg.mask_resolution)
        masks = jax.vmap(
            lambda ml, bx, v: paste_masks(ml, bx, canvas) & v[:, None, None])(
                mask_logits, det_boxes, det_valid)
        return (jnp.sum(mask_logits.astype(jnp.float32)),
                jnp.sum(masks.astype(jnp.float32)), jnp.sum(det_boxes))

    def full(self, images, image_sizes):
        return self.inference(images, image_sizes)

    rows = []
    prev = 0.0

    def run(name, method):
        nonlocal prev
        program = lambda p, x, s: model.apply(p, x, s, method=method)  # noqa: E731
        dt = timed_device_loop(program, params, images, image_sizes,
                               inner=args.reps)
        rows.append((name, dt, dt - prev))
        prev = dt

    run('backbone+fpn', pfx_backbone)
    run('+rpn_head', pfx_rpn_head)
    run('+proposal_nms', pfx_proposals)
    run('+box_roialign', pfx_box_pool)
    if os.environ.get('ATTRIB_FINE'):
        run('+box_head', pfx_box_head)
        run('+det_select', pfx_det_select)
        run('+mask_stage', pfx_mask_stage)
    run('full_inference', full)

    # full predictor step (preprocess resize/normalize + postprocess paste);
    # frames vary per inner iteration through the same epsilon chaining
    pred = Predictor(cfg, params, batch_size=b, score_threshold=0.0)
    frames = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (b, args.frame, args.frame), dtype=np.uint8))
    dt = timed_device_loop(
        lambda p, x, s: pred._step_impl(x.astype(jnp.uint8),
                                        (args.frame, args.frame)),
        params, frames, image_sizes, inner=args.reps)
    rows.append(('predictor_step (pre+post)', dt, dt - prev))
    prev = dt

    # + fused instance selection (mask-IoU NMS + centers inside the same
    # program — the extraction pipeline's path, Predictor select=True)
    dt = timed_device_loop(
        lambda p, x, s: pred._step_impl(x.astype(jnp.uint8),
                                        (args.frame, args.frame),
                                        with_select=True),
        params, frames, image_sizes, inner=args.reps)
    rows.append(('predictor_step+select', dt, dt - prev))

    # FLOPs / MFU from XLA cost analysis of the full inference program
    lowered = jax.jit(
        lambda p, x, s: model.apply(p, x, s, method=full)).lower(
            params, images, image_sizes)
    try:
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get('flops', float('nan')))
        bytes_acc = float(ca.get('bytes accessed', float('nan')))
    except Exception as exc:  # noqa: BLE001
        flops, bytes_acc = float('nan'), float('nan')
        print(f'cost_analysis unavailable: {exc}', file=sys.stderr)

    # feature-stage window economics: clean_frames on 160px detection
    # windows vs full ROI frames (the round-3 windowed feature stage)
    from moseq2_detectron_extract_tpu.proc.features import clean_frames
    rng = np.random.default_rng(2)
    full_frames = jnp.asarray(rng.integers(
        0, 100, (b, args.frame, args.frame), dtype=np.uint8))
    wins = jnp.asarray(rng.integers(0, 100, (b, 160, 160), dtype=np.uint8))
    clean_full_dt = timed_device_loop(
        lambda p, x, s: jnp.sum(clean_frames(x.astype(jnp.uint8),
                                             iters_tail=3)
                                .astype(jnp.float32)),
        params, full_frames, image_sizes, inner=args.reps)
    clean_win_dt = timed_device_loop(
        lambda p, x, s: jnp.sum(clean_frames(x.astype(jnp.uint8),
                                             iters_tail=3)
                                .astype(jnp.float32)),
        params, wins, image_sizes, inner=args.reps)

    full_dt = rows[-3][1]
    step_dt = rows[-2][1]
    peak = 197e12  # v5e bf16 peak FLOP/s
    lines = [
        '# Device-program attribution',
        '',
        f'batch={b} frame={args.frame} canvas={canvas} '
        f'proposals={cfg.rpn_post_nms_topk_test} dets={args.dets} '
        f'backend={jax.default_backend()}',
        '',
        '| stage (cumulative) | total s | stage delta s | stage fps |',
        '|---|---|---|---|',
    ]
    for name, total, delta in rows:
        fps = b / delta if delta > 1e-9 else float('inf')
        lines.append(f'| {name} | {total:.4f} | {delta:.4f} | {fps:.0f} |')
    lines += [
        '',
        f'- full-inference fps (no pre/post): **{b / full_dt:.1f}**',
        f'- predictor-step fps: **{b / step_dt:.1f}**',
        f'- XLA flops (batch): {flops:.3e} ({flops / b / 1e9:.2f} GF/frame)',
        f'- bytes accessed: {bytes_acc:.3e}',
        f'- MFU at full-inference time: {flops / full_dt / peak * 100:.2f}% '
        f'of {peak / 1e12:.0f} TF/s',
        f'- HBM BW implied: {bytes_acc / full_dt / 1e9:.1f} GB/s',
        f'- clean_frames {args.frame}px full: {clean_full_dt * 1000:.1f} ms '
        f'/batch vs 160px windows: {clean_win_dt * 1000:.1f} ms '
        f'({clean_full_dt / max(clean_win_dt, 1e-9):.1f}x)',
    ]
    report = '\n'.join(lines)
    print(report)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out)
    with open(out, 'w', encoding='utf-8') as fh:
        fh.write(report + '\n')
    print(f'\nwritten to {out}')


if __name__ == '__main__':
    main()
