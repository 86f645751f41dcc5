'''Cross-validation of models/eval.py against the vendored pycocotools port.

The repo evaluator reorganizes COCOeval's computation (per-task similarity
matrices + flat accumulation); tests/vendored_cocoeval.py is a faithful
structural port of the upstream algorithm. Randomized scenarios — multiple
images, clutter detections, area-range spreads, score ties, empty images,
low-visibility keypoints — must produce IDENTICAL AP numbers from both
(VERDICT round-3 item 7; reference delegation: m2de/model/eval.py:23-162).
'''
import numpy as np
import pytest

from moseq2_detectron_extract_tpu.models.eval import evaluate_predictions
from tests.vendored_cocoeval import COCOevalLite

SIGMAS = (0.026, 0.035, 0.035, 0.079, 0.107, 0.107, 0.089, 0.026)
NK = len(SIGMAS)
H = W = 160


def _mask_from_box(box, h=H, w=W):
    x0, y0, x1, y1 = [int(round(v)) for v in box]
    m = np.zeros((h, w), bool)
    m[max(y0, 0):max(y1, 0), max(x0, 0):max(x1, 0)] = True
    return m


def _random_scenario(seed, n_images=4, max_gt=3, max_det=6,
                     tie_scores=False, with_empty=True, low_vis=False):
    '''Build (items, predictions) for evaluate_predictions and the grouped
    gt/dt lists for COCOevalLite from one underlying random truth.'''
    rng = np.random.default_rng(seed)
    items, preds = [], []
    gts_box, dts_box = [], []
    gts_seg, dts_seg = [], []
    gts_kp, dts_kp = [], []
    for img in range(n_images):
        n_gt = 0 if (with_empty and img == n_images - 1) else \
            int(rng.integers(1, max_gt + 1))
        annots = []
        g_box, g_seg, g_kp = [], [], []
        for _ in range(n_gt):
            # sizes spanning small (<32^2), medium, large (>96^2) areas
            size = float(rng.choice([14, 45, 110])) * rng.uniform(0.8, 1.2)
            x0 = rng.uniform(2, W - size - 2)
            y0 = rng.uniform(2, H - size - 2)
            box = [x0, y0, x0 + size, y0 + size]
            mask = _mask_from_box(box)
            kps = np.stack([rng.uniform(x0, x0 + size, NK),
                            rng.uniform(y0, y0 + size, NK),
                            np.where(rng.random(NK) < (0.5 if low_vis else 0.9),
                                     2.0, 0.0)], axis=1)
            if low_vis and rng.random() < 0.3:
                kps[:, 2] = 0.0      # fully-invisible gt (computeOks k1=0 arm)
            annots.append({'bbox': box, 'segmentation': mask,
                           'keypoints': kps.reshape(-1).tolist(),
                           'category_id': 1})
            area = float(mask.sum())
            xywh = [box[0], box[1], box[2] - box[0], box[3] - box[1]]
            g_box.append({'bbox': xywh, 'area': area, 'ignore': 0})
            g_seg.append({'bbox': xywh, 'area': area, 'ignore': 0,
                          'segmentation': mask})
            g_kp.append({'bbox': xywh, 'area': area, 'ignore': 0,
                         'keypoints': kps.reshape(-1).tolist()})
        items.append({'file_name': f'img{img}.png', 'height': H, 'width': W,
                      'image_id': img, 'annotations': annots})

        n_det = int(rng.integers(0, max_det + 1))
        boxes, scores, masks, kpts = [], [], [], []
        for d in range(n_det):
            if n_gt and rng.random() < 0.7:
                gi = int(rng.integers(0, n_gt))
                gb = np.asarray(annots[gi]['bbox'], float)
                jitter = rng.normal(0, rng.choice([1.0, 6.0, 20.0]), 4)
                box = np.clip(gb + jitter, 0, W).tolist()
                if box[2] <= box[0] or box[3] <= box[1]:
                    box = gb.tolist()
                kp = np.asarray(annots[gi]['keypoints'], float).reshape(-1, 3)
                kp = kp + rng.normal(0, rng.choice([0.5, 4.0, 15.0]),
                                     kp.shape)
                kp[:, 2] = rng.uniform(0.3, 1.0, NK)
            else:                      # clutter detection
                size = float(rng.choice([12, 40, 120]))
                x0 = rng.uniform(0, W - size)
                y0 = rng.uniform(0, H - size)
                box = [x0, y0, x0 + size, y0 + size]
                kp = np.stack([rng.uniform(x0, x0 + size, NK),
                               rng.uniform(y0, y0 + size, NK),
                               rng.uniform(0.3, 1.0, NK)], axis=1)
            boxes.append(box)
            masks.append(_mask_from_box(box))
            kpts.append(kp)
            scores.append(round(float(rng.uniform(0.1, 1.0)), 1)
                          if tie_scores else float(rng.uniform(0.1, 1.0)))
        boxes = np.asarray(boxes, float).reshape(-1, 4)
        scores_a = np.asarray(scores, float)
        masks_a = np.asarray(masks, bool).reshape(-1, H, W)
        kpts_a = np.asarray(kpts, float).reshape(-1, NK, 3)
        preds.append({'boxes': boxes, 'scores': scores_a,
                      'valid': np.ones(len(boxes), bool),
                      'masks': masks_a, 'keypoints': kpts_a})
        d_box, d_seg, d_kp = [], [], []
        for b, s, m, kp in zip(boxes, scores_a, masks_a, kpts_a):
            xywh = [b[0], b[1], b[2] - b[0], b[3] - b[1]]
            d_box.append({'bbox': xywh, 'score': float(s),
                          'area': float(xywh[2] * xywh[3])})
            d_seg.append({'bbox': xywh, 'score': float(s),
                          'segmentation': m, 'area': float(m.sum())})
            # pycocotools loadRes keypoint area: keypoint-extent bbox
            kx, ky = kp[:, 0], kp[:, 1]
            d_kp.append({'bbox': xywh, 'score': float(s),
                         'keypoints': kp.reshape(-1).tolist(),
                         'area': float((kx.max() - kx.min()) *
                                       (ky.max() - ky.min()))})
        gts_box.append(g_box)
        dts_box.append(d_box)
        gts_seg.append(g_seg)
        dts_seg.append(d_seg)
        gts_kp.append(g_kp)
        dts_kp.append(d_kp)
    return (items, preds,
            {'bbox': (gts_box, dts_box), 'segm': (gts_seg, dts_seg),
             'keypoints': (gts_kp, dts_kp)})


SCENARIOS = [
    dict(seed=0),
    dict(seed=1, tie_scores=True),
    dict(seed=2, n_images=6, max_det=8),
    dict(seed=3, low_vis=True),
    dict(seed=4, n_images=3, max_gt=4, with_empty=False),
    dict(seed=5, tie_scores=True, low_vis=True, n_images=5),
]


@pytest.mark.parametrize('kwargs', SCENARIOS,
                         ids=[f"scenario{d['seed']}" for d in SCENARIOS])
def test_eval_matches_vendored_cocoeval(kwargs):
    items, preds, grouped = _random_scenario(**kwargs)
    ours = evaluate_predictions(items, preds, SIGMAS)
    for task in ('bbox', 'segm', 'keypoints'):
        gts, dts = grouped[task]
        ref = COCOevalLite(gts, dts, iouType=task,
                           kpt_oks_sigmas=SIGMAS if task == 'keypoints'
                           else None).evaluate_and_accumulate().summarize()
        for key, ref_val in ref.items():
            assert key in ours[task], (task, key)
            got = ours[task][key]
            assert got == pytest.approx(ref_val, abs=1e-6), \
                (task, key, got, ref_val, kwargs)
