'''IoU matching + balanced fg/bg sampling with static shapes.

Replaces Detectron2's Matcher + subsample_labels. Dynamic-count sampling is
reformulated as masked top-k selections so the whole thing jits: positives
get random priorities and a static cap, negatives fill the remainder via a
rank-vs-dynamic-count comparison.
'''
from typing import Tuple

import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.ops.boxes import pairwise_iou


def match_anchors_to_gt(anchors, gt_boxes, gt_valid, high_thresh: float,
                        low_thresh: float, allow_low_quality: bool):
    '''Match (A, 4) anchors against padded (G, 4) gt boxes.

    Returns (matched_idx (A,), labels (A,)) with labels 1=fg, 0=bg, -1=ignore.
    Invalid gt rows never match. With ``allow_low_quality``, each gt's
    best-overlapping anchors are forced positive (D2 Matcher semantics).
    '''
    iou = pairwise_iou(anchors, gt_boxes)               # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    matched_iou = jnp.max(iou, axis=1)
    matched_idx = jnp.argmax(iou, axis=1)

    labels = jnp.full(anchors.shape[0], -1, jnp.int32)
    labels = jnp.where(matched_iou < low_thresh, 0, labels)
    labels = jnp.where(matched_iou >= high_thresh, 1, labels)

    if allow_low_quality:
        # anchors that tie the per-gt max overlap become positive
        per_gt_best = jnp.max(iou, axis=0)               # (G,)
        is_best = (iou == per_gt_best[None, :]) & gt_valid[None, :] & \
            (per_gt_best[None, :] > 0)
        forced = jnp.any(is_best, axis=1)
        labels = jnp.where(forced, 1, labels)

    # no valid gt at all -> everything background
    any_gt = jnp.any(gt_valid)
    labels = jnp.where(any_gt, labels, jnp.zeros_like(labels))
    return matched_idx, labels


def subsample_labels(labels, num_samples: int, positive_fraction: float,
                     key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    '''Sample a balanced fg/bg subset of exactly ``num_samples`` slots.

    Returns (idx (num_samples,), valid (num_samples,), is_pos (num_samples,)).
    Positives are capped at num_samples*positive_fraction; negatives fill the
    remaining quota (D2 subsample_labels semantics). Padding slots have
    valid=False and idx=0.
    '''
    a = labels.shape[0]
    pos_cap = int(num_samples * positive_fraction)
    key_pos, key_neg = jax.random.split(key)

    pos_mask = labels == 1
    neg_mask = labels == 0

    pos_prio = jnp.where(pos_mask, jax.random.uniform(key_pos, (a,)), -jnp.inf)
    pos_scores, pos_idx = jax.lax.top_k(pos_prio, pos_cap)
    pos_valid = jnp.isfinite(pos_scores)
    n_pos = jnp.sum(pos_valid)

    neg_prio = jnp.where(neg_mask, jax.random.uniform(key_neg, (a,)), -jnp.inf)
    neg_scores, neg_idx = jax.lax.top_k(neg_prio, num_samples)
    neg_valid = jnp.isfinite(neg_scores) & \
        (jnp.arange(num_samples) < (num_samples - n_pos))

    # compact the (pos_cap + num_samples) candidates into num_samples slots,
    # valid entries first
    all_idx = jnp.concatenate([pos_idx, neg_idx])
    all_valid = jnp.concatenate([pos_valid, neg_valid])
    all_is_pos = jnp.concatenate([jnp.ones(pos_cap, bool), jnp.zeros(num_samples, bool)])

    order_prio = all_valid.astype(jnp.float32) * 2.0 - \
        jnp.arange(all_idx.shape[0], dtype=jnp.float32) * 1e-6
    _, order = jax.lax.top_k(order_prio, num_samples)
    return (jnp.where(all_valid[order], all_idx[order], 0),
            all_valid[order], all_is_pos[order] & all_valid[order])
