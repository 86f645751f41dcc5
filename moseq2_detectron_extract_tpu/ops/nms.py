'''Static-shape NMS for TPU.

Replaces Detectron2's CUDA NMS. Greedy NMS has a sequential dependency, so we
compute it as a fixpoint of the suppression relation: a box is kept iff no
higher-scored *kept* box overlaps it above the threshold. Iterating this
relation converges to exactly the greedy result in O(longest suppression
chain) matrix-vector steps — short (< ~10) for detection workloads — with
every step a dense (K, K) masked reduction that maps straight onto the VPU.
A bounded ``lax.while_loop`` runs until the keep mask stops changing.
'''
import functools

import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.ops.boxes import pairwise_iou


@functools.partial(jax.jit, static_argnames=('max_iters',))
def nms_keep_mask(boxes, scores, iou_threshold, valid=None, max_iters: int = 32):
    '''Greedy-NMS keep mask over (K, 4) boxes with (K,) scores.

    ``valid`` masks out padding boxes (treated as suppressed). Ties are broken
    by index (earlier index wins), matching torchvision sort order semantics.
    Returns bool (K,).
    '''
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), bool)

    iou = pairwise_iou(boxes, boxes)
    idx = jnp.arange(k)
    # "j dominates i": j valid, overlaps i, and strictly ranks before i
    rank_before = (scores[None, :] > scores[:, None]) | \
        ((scores[None, :] == scores[:, None]) & (idx[None, :] < idx[:, None]))
    dominates = (iou > iou_threshold) & rank_before & valid[None, :]

    # Monotone decided-state propagation (exact greedy result):
    #   a box is DECIDED-KEPT once every dominating box is decided-suppressed;
    #   a box is DECIDED-SUPPRESSED once any dominating box is decided-kept.
    # Each round decides at least the best-ranked undecided box, so the loop
    # terminates in <= longest-suppression-chain rounds.
    def cond(state):
        keep, supp, it = state
        return (it < max_iters) & jnp.any(valid & ~keep & ~supp)

    def body(state):
        keep, supp, it = state
        new_keep = keep | (valid & ~supp &
                           ~jnp.any(dominates & ~supp[None, :], axis=1))
        new_supp = supp | jnp.any(dominates & new_keep[None, :], axis=1)
        return new_keep, new_supp, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((k,), bool), jnp.zeros((k,), bool), jnp.asarray(0)))
    return keep


def batched_nms_keep_mask(boxes, scores, idxs, iou_threshold, valid=None,
                          max_iters: int = 32):
    '''Category-aware NMS: boxes in different ``idxs`` groups never suppress
    each other (torchvision.batched_nms coordinate-offset trick).'''
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_keep_mask(shifted, scores, iou_threshold, valid=valid,
                         max_iters=max_iters)


def topk_after_nms(boxes, scores, keep, k: int):
    '''Select the top-``k`` kept boxes by score, padded with zeros.

    Returns (boxes (k, 4), scores (k,), valid (k,)) — static shapes.
    '''
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[top_idx]
    top_valid = jnp.isfinite(top_scores)
    return (jnp.where(top_valid[:, None], top_boxes, 0.0),
            jnp.where(top_valid, top_scores, 0.0),
            top_valid, top_idx)
