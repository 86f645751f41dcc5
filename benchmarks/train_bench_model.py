'''Train the committed benchmark checkpoint on the BENCH distribution.

The headline bench (bench.py) extracts a synthetic Kinect session through the
full pipeline; the model sees ROI-cropped, background-subtracted,
height-scaled uint8 frames resized onto the 256 canvas. A checkpoint trained
on a different intensity/scale distribution (e.g. benchmarks/overfit_ap.py's
raw-height mice) misses these frames at the production threshold — measured
1/8 detections. This script renders training views through the SAME ops the
pipeline uses (prep_raw_frames_host -> decode -> scale_raw_frames -> the
predictor's resize+pad), with randomized mouse pose, so the committed
checkpoint detects the bench workload honestly at threshold 0.5.

Usage:  SAVE_DIR=/tmp/bench_model python benchmarks/train_bench_model.py
Then:   package with models.checkpoint.save_params_npz into
        benchmarks/bench_model/params_f16.npz (see that module).
'''
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

N_IMAGES = int(os.environ.get('N_IMAGES', 192))
MAX_STEPS = int(os.environ.get('STEPS', 4000))
MIN_STEPS = int(os.environ.get('MIN_STEPS', 0))
EVAL_EVERY = int(os.environ.get('EVAL_EVERY', 250))
TARGET_RATE = float(os.environ.get('TARGET_RATE', 0.99))
# keypoint-teeth stopping criterion (VERDICT r4 item 3): with the head-bump
# mice the tip-to-tail order is learnable, so the trainer holds out a fresh
# pose set and only stops once keypoint AP50 clears this floor too (set 0
# to restore the detection-rate-only behavior)
TARGET_KP_AP50 = float(os.environ.get('TARGET_KP_AP50', 90.0))
N_EVAL_AP = int(os.environ.get('N_EVAL_AP', 48))
SEED = 0


def make_items(data):
    '''GT DataItems for the evaluator, straight from the synthetic arrays.'''
    items = []
    for i in range(len(data['image'])):
        m = data['masks'][i, 0]
        ys, xs = np.where(m)
        items.append({
            'height': m.shape[0], 'width': m.shape[1], 'file_name': '<mem>',
            'annotations': [{
                'bbox': [float(xs.min()), float(ys.min()),
                         float(xs.max() + 1), float(ys.max() + 1)],
                'segmentation': m,
                'keypoints': data['keypoints'][i, 0].ravel().tolist(),
            }],
        })
    return items


def eval_ap(cfg, params, eval_data, eval_items):
    '''COCO AP (bbox/segm/keypoints) on a held-out bench-view pose set.'''
    from moseq2_detectron_extract_tpu.models.eval import evaluate_predictions
    from moseq2_detectron_extract_tpu.models.predictor import Predictor
    predictor = Predictor(cfg, params, batch_size=min(len(eval_items), 24),
                          score_threshold=0.5)
    out = predictor(np.clip(eval_data['image'], 0, 255).astype('uint8'))
    preds = [{k: v[i] for k, v in out.items()}
             for i in range(len(eval_items))]
    return evaluate_predictions(eval_items, preds, cfg.oks_sigmas)

# BENCH_CANVAS overrides the model canvas (e.g. 192 for the fast inference
# variant: ~1.8x less backbone/FPN work; min/max test sizes scale with it so
# ResizeShortestEdge fills the smaller canvas the same way)


def config_overrides():
    '''ModelConfig kwargs from the env (fast-variant canvas etc.).'''
    out = {}
    canvas = os.environ.get('BENCH_CANVAS')
    if canvas:
        canvas = int(canvas)
        ratio = canvas / 256.0
        out.update(image_size=canvas,
                   min_size_test=int(240 * ratio),
                   max_size_test=int(250 * ratio),
                   min_size_train=int(240 * ratio),
                   max_size_train=int(250 * ratio))
    topk = os.environ.get('BENCH_TOPK')
    if topk:
        out['rpn_post_nms_topk_test'] = int(topk)
    cap = os.environ.get('BENCH_NMS_CAP')
    if cap:
        out['rpn_nms_global_cap'] = int(cap)
    # BENCH_LR_STEPS="1120,1280,1440": compressed WarmupMultiStepLR decay
    # boundaries (reference schedule ratios 70/80/90% of max_iter,
    # m2de/model/config.py:60-68) so the gamma=0.05 step decays actually
    # EXECUTE within a bench-scale run (VERDICT r4 item 7)
    lr_steps = os.environ.get('BENCH_LR_STEPS')
    if lr_steps:
        out['lr_steps'] = tuple(int(s) for s in lr_steps.split(','))
    return out


def roi_view_params():
    '''The bench session's deterministic ROI crop: (x0, y0, side, scale,
    new_side) where scale maps ROI pixels onto the model's 240px test view.'''
    from moseq2_detectron_extract_tpu.io.session import Session
    from moseq2_detectron_extract_tpu.models.config import ModelConfig
    from moseq2_detectron_extract_tpu.models.predictor import compute_test_scale
    from moseq2_detectron_extract_tpu.ops.preprocess import bbox_from_roi

    work = tempfile.mkdtemp(prefix='benchview_')
    path = bench.write_session(os.path.join(work, 's'), 8)
    sess = Session(path)
    sess._bground_im = bench.make_background()
    sess.find_roi(bg_roi_depth_range=(650, 750), cache_dir=None)
    (y0, x0), (y1, x1) = bbox_from_roi(sess.roi)
    side = max(y1 - y0, x1 - x0)
    cfg = ModelConfig(**config_overrides())
    scale = compute_test_scale(side, side, cfg.min_size_test, cfg.max_size_test)
    return sess.roi, sess.bground_im, (x0, y0), side, scale


def make_bench_view_dataset(rng, n, cfg, roi, bground, origin, side, scale):
    '''n model-view training samples rendered through the real prep ops.'''
    import cv2
    import jax
    import jax.numpy as jnp
    from moseq2_detectron_extract_tpu.ops.preprocess import (
        decode_prepped_frames, prep_raw_frames_host, scale_raw_frames)

    s = cfg.image_size
    k = cfg.num_keypoints
    new_side = int(side * scale + 0.5)
    x0, y0 = origin
    h, w = bground.shape

    images = np.zeros((n, s, s), 'float32')
    masks = np.zeros((n, 1, s, s), bool)
    keypoints = np.zeros((n, 1, k, 3), 'float32')
    valid = np.ones((n, 1), bool)

    cx_a, cy_a = w / 2, h / 2
    r_max = h / 2 - 10 - 45        # arena radius minus mouse long axis margin
    for i in range(n):
        rad = r_max * np.sqrt(rng.uniform(0, 1))
        th = rng.uniform(0, 2 * np.pi)
        cx, cy = cx_a + rad * np.cos(th), cy_a + rad * np.sin(th)
        ang = rng.uniform(0, 360)
        body, head = bench.draw_mouse((h, w), cx, cy, ang)
        raw = bground.copy()
        raw[body > 0] = bench.FLOOR_DEPTH - bench.MOUSE_HEIGHT
        raw[head > 0] = bench.FLOOR_DEPTH - bench.MOUSE_HEIGHT \
            - bench.HEAD_HEIGHT
        raw = np.clip(raw + rng.normal(0, 1.0, raw.shape), 0, 65535)
        prepped = prep_raw_frames_host(
            raw[None].astype('<u2'), bground_im=bground, roi=roi,
            vmin=0, vmax=100, dtype='uint8')
        dec = decode_prepped_frames(jnp.asarray(prepped))
        view = scale_raw_frames(dec, 0, 100)          # uint8 ROI view
        # the predictor's test-time resize+pad, reproduced exactly
        resized = jax.image.resize(view.astype(jnp.float32),
                                   (1, new_side, new_side), method='bilinear')
        images[i, :new_side, :new_side] = np.asarray(resized[0])

        # GT in model-view coordinates (body + head bump, like the raw)
        mcx, mcy = (cx - x0) * scale, (cy - y0) * scale
        ax_a = max(int(round(bench.MOUSE_AXES[0] * scale)), 1)
        ax_b = max(int(round(bench.MOUSE_AXES[1] * scale)), 1)
        gm = np.zeros((s, s), np.uint8)
        cv2.ellipse(gm, (int(round(mcx)), int(round(mcy))),
                    (ax_a, ax_b), ang, 0, 360, 1, -1)
        ca, sa = np.cos(np.radians(ang)), np.sin(np.radians(ang))
        ghx = mcx - bench.HEAD_AXIS_FRAC * ax_a * ca
        ghy = mcy - bench.HEAD_AXIS_FRAC * ax_a * sa
        cv2.circle(gm, (int(round(ghx)), int(round(ghy))),
                   max(int(ax_b * 1.25), 2), 1, -1)
        masks[i, 0] = gm > 0
        t = np.linspace(-0.8 * bench.MOUSE_AXES[0] * scale,
                        0.8 * bench.MOUSE_AXES[0] * scale, k)
        keypoints[i, 0, :, 0] = mcx + t * ca
        keypoints[i, 0, :, 1] = mcy + t * sa
        keypoints[i, 0, :, 2] = 2.0
    return {'image': images, 'masks': masks, 'keypoints': keypoints,
            'valid': valid}


def detection_rate(cfg, params, threshold=0.5, nframes=64):
    '''Detections/frame on REAL bench-session frames through the REAL
    pipeline prep + Predictor — the number the committed checkpoint is for.'''
    import jax.numpy as jnp
    from functools import partial
    from moseq2_detectron_extract_tpu.io.session import Session, Stream
    from moseq2_detectron_extract_tpu.models.predictor import Predictor
    from moseq2_detectron_extract_tpu.ops.preprocess import (
        decode_prepped_frames, prep_raw_frames_host, scale_raw_frames)

    work = tempfile.mkdtemp(prefix='benchdet_')
    path = bench.write_session(os.path.join(work, 's'), nframes, seed=1)
    sess = Session(path)
    sess._bground_im = bench.make_background()
    sess.find_roi(bg_roi_depth_range=(650, 750), cache_dir=None)
    it = sess.iterate(chunk_size=nframes, streams=(Stream.DEPTH,))
    it.attach_filter(Stream.DEPTH, partial(
        prep_raw_frames_host, bground_im=sess.bground_im, roi=sess.roi,
        vmin=0, vmax=100, dtype='uint8'))
    _, chunk = next(iter(it))
    frames = scale_raw_frames(decode_prepped_frames(jnp.asarray(
        np.asarray(chunk))), 0, 100)
    pred = Predictor(cfg, params, batch_size=min(nframes, 32),
                     score_threshold=threshold)
    out = pred(np.asarray(frames))
    per_frame = np.asarray(out['valid']).any(axis=1)
    return float(per_frame.mean()), float(np.asarray(out['scores'])[:, 0].mean())


def main():
    import jax
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from moseq2_detectron_extract_tpu.models.config import ModelConfig
    from moseq2_detectron_extract_tpu.models.train import (create_train_state,
                                                           make_train_step)

    cfg = ModelConfig(
        test_detections_per_image=1, max_gt_instances=1,
        base_lr=float(os.environ.get('LR', 5e-3)),
        warmup_iters=int(os.environ.get('WARMUP', 300)),
        **config_overrides())
    print(f'devices: {jax.devices()}  canvas {cfg.image_size}', flush=True)

    rng = np.random.default_rng(SEED)
    roi, bground, origin, side, scale = roi_view_params()
    print(f'ROI side={side} view scale={scale:.4f}', flush=True)
    data = make_bench_view_dataset(rng, N_IMAGES, cfg, roi, bground,
                                   origin, side, scale)
    dev = {k: jnp.asarray(v) for k, v in data.items()}
    batch_size = 8
    # held-out AP set: fresh poses (disjoint seed), same render path
    eval_data, eval_items = None, None
    if TARGET_KP_AP50 > 0:
        eval_rng = np.random.default_rng(SEED + 5000)
        eval_data = make_bench_view_dataset(eval_rng, N_EVAL_AP, cfg, roi,
                                            bground, origin, side, scale)
        eval_items = make_items(eval_data)

    mean = jnp.asarray(cfg.pixel_mean)
    std = jnp.asarray(cfg.pixel_std)

    @jax.jit
    def prep_batch(idx):
        x = jnp.repeat(dev['image'][idx][..., None], 3, axis=-1)
        x = (x - mean) / std
        imasks = dev['masks'][idx]

        def box_of(masks_one):
            def one(m):
                any_m = jnp.any(m)
                ys = jnp.any(m, axis=1)
                xs = jnp.any(m, axis=0)
                iy = jnp.arange(m.shape[0], dtype=jnp.float32)
                ix = jnp.arange(m.shape[1], dtype=jnp.float32)
                y1 = jnp.min(jnp.where(ys, iy, jnp.inf))
                y2 = jnp.max(jnp.where(ys, iy, -jnp.inf)) + 1
                x1 = jnp.min(jnp.where(xs, ix, jnp.inf))
                x2 = jnp.max(jnp.where(xs, ix, -jnp.inf)) + 1
                return jnp.where(any_m, jnp.stack([x1, y1, x2, y2]),
                                 jnp.zeros(4))
            return jax.vmap(one)(masks_one)

        gt = {'boxes': jax.vmap(box_of)(imasks), 'valid': dev['valid'][idx],
              'masks': imasks, 'keypoints': dev['keypoints'][idx]}
        return x, gt

    state = create_train_state(cfg, jax.random.PRNGKey(SEED))
    step_fn = make_train_step(cfg)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    best = None
    for step in range(1, MAX_STEPS + 1):
        key, pk, sk = jax.random.split(key, 3)
        idx = jax.random.choice(pk, N_IMAGES, (batch_size,), replace=False)
        images, gt = prep_batch(idx)
        state, metrics = step_fn(state, {'images': images, 'gt': gt}, sk)
        if step == 1:
            jax.block_until_ready(metrics['total_loss'])
            print(f'compile+step1: {time.time() - t0:.1f}s', flush=True)
        if step % EVAL_EVERY == 0 or step == MAX_STEPS:
            loss = float(np.asarray(metrics['total_loss']))
            rate, mean_score = detection_rate(cfg, state.params)
            row = {'step': step, 'loss': round(loss, 3),
                   'lr': float(np.asarray(metrics.get('lr', np.nan))),
                   'bench_detection_rate': round(rate, 4),
                   'mean_top_score': round(mean_score, 3),
                   'elapsed_s': round(time.time() - t0, 1)}
            kp_ok = True
            if eval_items is not None:
                res = eval_ap(cfg, state.params, eval_data, eval_items)
                row.update(
                    bbox_AP50=round(res['bbox']['AP50'], 2),
                    segm_AP50=round(res['segm']['AP50'], 2),
                    kp_AP50=round(res['keypoints']['AP50'], 2),
                    kp_AP=round(res['keypoints']['AP'], 2))
                kp_ok = row['kp_AP50'] >= TARGET_KP_AP50
            best = row
            print(json.dumps(row), flush=True)
            if rate >= TARGET_RATE and kp_ok and step >= MIN_STEPS:
                print(f'TARGET REACHED at step {step}', flush=True)
                break

    save_dir = os.environ.get('SAVE_DIR')
    if save_dir:
        from moseq2_detectron_extract_tpu.models.checkpoint import save_checkpoint
        os.makedirs(save_dir, exist_ok=True)
        cfg.to_yaml(os.path.join(save_dir, 'config.yaml'))
        save_checkpoint(save_dir, int(np.asarray(state.step)),
                        {'params': jax.device_get(state.params)})
        print(f'saved model dir: {save_dir}', flush=True)
    print(json.dumps({'final': best}), flush=True)


if __name__ == '__main__':
    main()
