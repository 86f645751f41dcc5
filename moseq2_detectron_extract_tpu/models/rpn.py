'''Region Proposal Network: head, static-topk proposal selection, losses.

Replaces Detectron2's RPN + find_top_rpn_proposals. Proposal selection is
fully static: per-level top-k by objectness, concat, level-aware NMS (fixpoint
greedy, ops/nms.py), final top-k padding with validity masks.
'''
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.ops.boxes import (clip_boxes, decode_boxes,
                                                       encode_boxes, nonempty_boxes)
from moseq2_detectron_extract_tpu.models.matcher import (match_anchors_to_gt,
                                                         subsample_labels)
from moseq2_detectron_extract_tpu.ops.nms import batched_nms_keep_mask

# default for select_proposals' per-level pre-NMS clamp (see its docstring);
# module-level so A/B harnesses can toggle the unclamped baseline
CLAMP_LEVEL_K = True


class RPNHead(nn.Module):
    '''Shared 3x3 conv + 1x1 objectness / 1x1 anchor-deltas heads.'''
    num_anchors: int
    conv_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        # hidden conv in the AMP dtype; the 1x1 output convs keep flax's
        # promote-to-f32 default so objectness/deltas leave f32
        conv = nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                       name='conv')
        obj = nn.Conv(self.num_anchors, (1, 1), name='objectness')
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name='deltas')
        logits, bbox_deltas = [], []
        for feat in features:
            t = nn.relu(conv(feat))
            logits.append(obj(t))
            bbox_deltas.append(deltas(t))
        return logits, bbox_deltas


def select_proposals(anchors_per_level: Sequence[jnp.ndarray],
                     logits_per_level: Sequence[jnp.ndarray],
                     deltas_per_level: Sequence[jnp.ndarray],
                     image_size: Tuple[int, int],
                     pre_nms_topk: int, post_nms_topk: int,
                     nms_thresh: float, box_reg_weights,
                     global_cap: int = None, _clamp_level_k: bool = None):
    '''Single-image proposal selection -> (boxes (P, 4), scores (P,), valid (P,)).

    P = post_nms_topk (static). Mirrors D2 find_top_rpn_proposals: per-level
    pre-NMS topk, decode, clip, drop empties, level-aware NMS, global topk.

    ``global_cap``: optionally restrict the NMS candidate pool to the global
    top-``cap`` boxes by score (across levels). Greedy NMS decides each box
    purely from HIGHER-ranked boxes, so the kept set inside the top-``cap``
    is bitwise identical to the uncapped run's kept set restricted to those
    boxes — the final top-``post_nms_topk`` output is EXACT whenever at
    least ``post_nms_topk`` of the capped candidates survive (always, in
    practice: suppression at IoU>0.7 removes well under 75%% of RPN
    candidates). The IoU matrix shrinks (n_levels*pre_topk)^2 ->
    cap^2 — 25x less NMS memory traffic at the production shape.
    '''
    # with a global cap, a candidate outside its level's top-``cap`` can
    # only enter the global top-``cap`` pool if higher-scored SAME-level
    # candidates decode to empty boxes (validity is applied at the global
    # selection) — clamping the per-level pre-NMS k to the cap is exact
    # whenever no level's top-``cap`` contains an empty decoded box (the
    # overwhelmingly common case; bit-identity on the production workload
    # verified in benchmarks/PROPOSAL_AB.md Run C). 2.5x smaller global
    # top_k input at the production 1000/level setting.
    if _clamp_level_k is None:
        _clamp_level_k = CLAMP_LEVEL_K
    level_k = pre_nms_topk if global_cap is None or not _clamp_level_k \
        else min(pre_nms_topk, global_cap)
    cand_boxes, cand_scores, cand_levels, cand_valid = [], [], [], []
    for level, (anchors, logits, deltas) in enumerate(
            zip(anchors_per_level, logits_per_level, deltas_per_level)):
        flat_logits = logits.reshape(-1).astype(jnp.float32)
        flat_deltas = deltas.reshape(-1, 4).astype(jnp.float32)
        k = min(level_k, flat_logits.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat_logits, k)
        top_anchors = anchors[top_idx]
        top_deltas = flat_deltas[top_idx]
        boxes = decode_boxes(top_deltas, top_anchors, box_reg_weights)
        boxes = clip_boxes(boxes, image_size)
        valid = nonempty_boxes(boxes)
        cand_boxes.append(boxes)
        cand_scores.append(top_scores)
        cand_levels.append(jnp.full((k,), level, jnp.int32))
        cand_valid.append(valid)

    boxes = jnp.concatenate(cand_boxes)
    scores = jnp.concatenate(cand_scores)
    levels = jnp.concatenate(cand_levels)
    valid = jnp.concatenate(cand_valid)

    if global_cap is not None and global_cap < scores.shape[0]:
        # lax.top_k is stable, so equal scores keep their concatenation
        # order — the NMS index tie-break below is unchanged by the cap
        cap_scores, cap_idx = jax.lax.top_k(
            jnp.where(valid, scores, -jnp.inf), global_cap)
        boxes = boxes[cap_idx]
        scores = scores[cap_idx]
        levels = levels[cap_idx]
        valid = jnp.isfinite(cap_scores)

    keep = batched_nms_keep_mask(boxes, scores, levels, nms_thresh, valid=valid)
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, post_nms_topk)
    top_valid = jnp.isfinite(top_scores)
    return (jnp.where(top_valid[:, None], boxes[top_idx], 0.0),
            jnp.where(top_valid, top_scores, 0.0), top_valid)


def rpn_losses(anchors: jnp.ndarray, logits: jnp.ndarray, deltas: jnp.ndarray,
               gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray, key,
               batch_size_per_image: int, positive_fraction: float,
               fg_thresh: float, bg_thresh: float, box_reg_weights,
               smooth_l1_beta: float = 0.0):
    '''Single-image RPN objectness + box-regression losses (summed, caller
    normalizes by batch_size_per_image * num_images like D2).

    anchors (A, 4); logits (A,); deltas (A, 4); gt padded (G, 4) + validity.
    '''
    matched_idx, labels = match_anchors_to_gt(anchors, gt_boxes, gt_valid,
                                              fg_thresh, bg_thresh,
                                              allow_low_quality=True)
    idx, valid, is_pos = subsample_labels(labels, batch_size_per_image,
                                          positive_fraction, key)

    s_logits = logits[idx]
    s_labels = is_pos.astype(jnp.float32)
    obj_loss = _bce_with_logits(s_logits, s_labels)
    obj_loss = jnp.sum(jnp.where(valid, obj_loss, 0.0))

    s_anchors = anchors[idx]
    s_gt = gt_boxes[matched_idx[idx]]
    target_deltas = encode_boxes(s_anchors, s_gt, box_reg_weights)
    reg = _smooth_l1(deltas[idx] - target_deltas, smooth_l1_beta)
    reg_loss = jnp.sum(jnp.where(is_pos[:, None], reg, 0.0))
    return obj_loss, reg_loss


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _smooth_l1(diff, beta: float):
    if beta <= 0:
        return jnp.abs(diff)
    absd = jnp.abs(diff)
    return jnp.where(absd < beta, 0.5 * absd * absd / beta, absd - 0.5 * beta)
