'''COCO-style AP evaluation (bbox / segm / keypoints with custom OKS sigmas).

Parity target: m2de/model/eval.py:23-162 + the COCOEvaluator the reference
delegates to. pycocotools is unavailable in this image, so the matching/AP
math is implemented directly (single-class, greedy score-ordered matching at
IoU/OKS thresholds 0.50:0.95:0.05, 101-point interpolated AP).
'''
import logging
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from moseq2_detectron_extract_tpu.io.annot import DataItem, poly_to_mask
from moseq2_detectron_extract_tpu.models.config import ModelConfig

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _box_iou_matrix(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    if len(pred) == 0 or len(gt) == 0:
        return np.zeros((len(pred), len(gt)))
    lt = np.maximum(pred[:, None, :2], gt[None, :, :2])
    rb = np.minimum(pred[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = np.prod(np.clip(pred[:, 2:] - pred[:, :2], 0, None), axis=1)
    area_g = np.prod(np.clip(gt[:, 2:] - gt[:, :2], 0, None), axis=1)
    union = area_p[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def _mask_iou_matrix(pred: Sequence[np.ndarray], gt: Sequence[np.ndarray]) -> np.ndarray:
    out = np.zeros((len(pred), len(gt)))
    for i, pm in enumerate(pred):
        for j, gm in enumerate(gt):
            inter = np.logical_and(pm, gm).sum()
            union = np.logical_or(pm, gm).sum()
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _oks_matrix(pred_kpts: np.ndarray, gt_kpts: np.ndarray, gt_areas: np.ndarray,
                sigmas: np.ndarray) -> np.ndarray:
    '''Object keypoint similarity (COCO formula) with per-keypoint sigmas.'''
    n_pred, n_gt = len(pred_kpts), len(gt_kpts)
    out = np.zeros((n_pred, n_gt))
    vars_ = (2 * sigmas) ** 2
    for j in range(n_gt):
        vis = gt_kpts[j, :, 2] > 0
        if not vis.any():
            continue
        scale = max(gt_areas[j], 1e-9)
        for i in range(n_pred):
            dx = pred_kpts[i, :, 0] - gt_kpts[j, :, 0]
            dy = pred_kpts[i, :, 1] - gt_kpts[j, :, 1]
            e = (dx ** 2 + dy ** 2) / (vars_ * 2 * scale)
            out[i, j] = np.mean(np.exp(-e[vis]))
    return out


def _average_precision(matched: np.ndarray, scores: np.ndarray, n_gt: int) -> float:
    '''101-point interpolated AP given per-prediction match flags.'''
    if n_gt == 0:
        return float('nan')
    order = np.argsort(-scores)
    tp = matched[order].astype(float)
    fp = 1.0 - tp
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(fp)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    # monotone non-increasing precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    return float(np.mean(np.interp(RECALL_POINTS, recall, precision,
                                   left=precision[0] if len(precision) else 0.0,
                                   right=0.0))) if len(precision) else 0.0


def _evaluate_task(sim_matrices: List[np.ndarray], scores_per_image: List[np.ndarray]
                   ) -> Dict[str, float]:
    '''AP over thresholds given per-image similarity matrices (P_i, G_i).'''
    n_gt = sum(m.shape[1] for m in sim_matrices)
    results = {}
    aps = []
    for thresh in IOU_THRESHOLDS:
        matched_flags = []
        all_scores = []
        for sim, scores in zip(sim_matrices, scores_per_image):
            order = np.argsort(-scores)
            gt_used = np.zeros(sim.shape[1], bool)
            flags = np.zeros(len(scores), bool)
            for i in order:
                if sim.shape[1] == 0:
                    break
                cand = np.where(~gt_used, sim[i], -1.0)
                j = int(np.argmax(cand))
                if cand[j] >= thresh:
                    gt_used[j] = True
                    flags[i] = True
            matched_flags.append(flags)
            all_scores.append(scores)
        ap = _average_precision(np.concatenate(matched_flags) if matched_flags else np.zeros(0),
                                np.concatenate(all_scores) if all_scores else np.zeros(0),
                                n_gt)
        aps.append(ap)
        if abs(thresh - 0.5) < 1e-9:
            results['AP50'] = ap * 100
        if abs(thresh - 0.75) < 1e-9:
            results['AP75'] = ap * 100
    results['AP'] = float(np.nanmean(aps)) * 100
    return results


def _gt_from_item(item: DataItem):
    boxes, masks, kpts = [], [], []
    h, w = item['height'], item['width']
    for annot in item['annotations']:
        boxes.append(np.asarray(annot['bbox'], float))
        seg = annot['segmentation']
        if isinstance(seg, np.ndarray):
            masks.append(seg.astype(bool))
        else:
            poly = np.reshape(np.asarray(seg[0], float), (-1, 2))
            masks.append(poly_to_mask(poly, (h, w))[..., 0].astype(bool))
        kp = np.asarray(annot.get('keypoints', []), float).reshape(-1, 3)
        kpts.append(kp)
    return (np.asarray(boxes).reshape(-1, 4), masks,
            np.asarray(kpts) if kpts and all(k.size for k in kpts) else np.zeros((0, 0, 3)))


def evaluate_predictions(items: Sequence[DataItem],
                         predictions: Sequence[Dict[str, np.ndarray]],
                         oks_sigmas: Sequence[float]) -> Dict[str, Dict[str, float]]:
    '''Compute bbox/segm/keypoints AP for per-image prediction dicts
    (boxes (D, 4), scores (D,), valid (D,), masks (D, H, W),
    keypoints (D, K, 3)).'''
    sigmas = np.asarray(oks_sigmas, float)
    box_sims, mask_sims, kp_sims, scores_list = [], [], [], []
    for item, pred in zip(items, predictions):
        gt_boxes, gt_masks, gt_kpts = _gt_from_item(item)
        valid = np.asarray(pred['valid'], bool)
        p_boxes = np.asarray(pred['boxes'])[valid]
        p_scores = np.asarray(pred['scores'])[valid]
        scores_list.append(p_scores)

        box_sims.append(_box_iou_matrix(p_boxes, gt_boxes))
        p_masks = [np.asarray(m, bool) for m in np.asarray(pred['masks'])[valid]]
        mask_sims.append(_mask_iou_matrix(p_masks, gt_masks))
        if gt_kpts.size:
            gt_areas = np.prod(np.clip(gt_boxes[:, 2:] - gt_boxes[:, :2], 0, None),
                               axis=1)
            kp_sims.append(_oks_matrix(np.asarray(pred['keypoints'])[valid],
                                       gt_kpts, gt_areas, sigmas))
        else:
            kp_sims.append(np.zeros((len(p_scores), 0)))

    return {
        'bbox': _evaluate_task(box_sims, scores_list),
        'segm': _evaluate_task(mask_sims, scores_list),
        'keypoints': _evaluate_task(kp_sims, scores_list),
    }


def evaluate_model(model_dir: str, items: Sequence[DataItem],
                   checkpoint: str = 'last', batch_size: int = 8,
                   cfg: Optional[ModelConfig] = None,
                   params=None) -> Dict[str, Dict[str, float]]:
    '''Load a model and evaluate over annotated items, logging data/compute
    seconds-per-iter like m2de/model/eval.py:125-155.'''
    from moseq2_detectron_extract_tpu.io.image import read_image
    from moseq2_detectron_extract_tpu.models.predictor import Predictor

    if cfg is not None and params is not None:
        predictor = Predictor(cfg, params, batch_size=batch_size)
    else:
        predictor = Predictor.from_model_dir(model_dir, checkpoint=checkpoint,
                                             batch_size=batch_size)

    predictions = []
    data_time = compute_time = 0.0
    for item in items:
        t0 = time.perf_counter()
        image = np.atleast_3d(read_image(item['file_name']))[:, :, 0]
        t1 = time.perf_counter()
        out = predictor(image[None].astype('uint8'))
        t2 = time.perf_counter()
        data_time += t1 - t0
        compute_time += t2 - t1
        predictions.append({k: v[0] for k, v in out.items()})
    n = max(len(items), 1)
    logging.info('eval timing: %.4f s/iter data, %.4f s/iter compute',
                 data_time / n, compute_time / n)

    sigmas = (cfg or predictor.cfg).oks_sigmas
    return evaluate_predictions(items, predictions, sigmas)
