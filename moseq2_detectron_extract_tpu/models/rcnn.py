'''Generalized Mask+Keypoint R-CNN with static shapes end-to-end.

The full forward (backbone -> FPN -> RPN -> ROI heads) compiles to one XLA
program: proposals, detections, masks, and keypoints are fixed-size padded
tensors with validity masks. Replaces the Detectron2 GeneralizedRCNN the
reference drives through m2de/model/predict.py and m2de/model/model.py.
'''
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.models.anchors import generate_anchors
from moseq2_detectron_extract_tpu.ops.boxes import (clip_boxes, decode_boxes,
                                                       encode_boxes)
from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.fpn import FPN
from moseq2_detectron_extract_tpu.models.heads import (BoxHead, KeypointHead, MaskHead,
                                                       heatmaps_to_keypoints,
                                                       keypoint_targets, paste_masks)
from moseq2_detectron_extract_tpu.models.matcher import (match_anchors_to_gt,
                                                         subsample_labels)
from moseq2_detectron_extract_tpu.models.resnet import ResNet
from moseq2_detectron_extract_tpu.models.rpn import (RPNHead, rpn_losses,
                                                     select_proposals, _bce_with_logits,
                                                     _smooth_l1)
from moseq2_detectron_extract_tpu.ops.nms import batched_nms_keep_mask
from moseq2_detectron_extract_tpu.ops.pallas_roi_align import pallas_separable_roi_align
from moseq2_detectron_extract_tpu.ops.roi_align import (batched_multilevel_roi_align,
                                                        crop_resize_mask)

_FPN_STRIDES = (4, 8, 16, 32, 64)


class MaskKeypointRCNN(nn.Module):
    '''R50-FPN Mask+Keypoint R-CNN (1 class, 8 keypoints by default).'''
    cfg: ModelConfig

    def setup(self):
        # compute dtype threads into every conv/norm: with flax's default
        # dtype=None, f32 params PROMOTE a bf16 input back to f32, so the
        # whole backbone silently ran f32 before (casting only the input is
        # not enough)
        self.backbone = ResNet(depth=self.cfg.resnet_depth,
                               norm=self.cfg.backbone_norm,
                               stage_blocks=self.cfg.resnet_stage_blocks,
                               width=self.cfg.resnet_width,
                               dtype=self._compute_dtype())
        self.fpn = FPN(out_channels=self.cfg.fpn_channels, norm=self.cfg.fpn_norm,
                       fuse_type=self.cfg.fpn_fuse_type,
                       dtype=self._compute_dtype())
        num_anchors = len(self.cfg.anchor_sizes[0]) * len(self.cfg.anchor_aspect_ratios)
        self.rpn_head = RPNHead(num_anchors=num_anchors,
                                conv_dim=self.cfg.fpn_channels,
                                dtype=self._compute_dtype())
        self.box_head = BoxHead(num_classes=self.cfg.num_classes,
                                fc_dim=self.cfg.box_fc_dim,
                                dtype=self._compute_dtype())
        if self.cfg.mask_on:
            self.mask_head = MaskHead(num_classes=self.cfg.num_classes,
                                      conv_dims=self.cfg.mask_conv_dims,
                                      dtype=self._compute_dtype())
        if self.cfg.keypoint_on:
            self.keypoint_head = KeypointHead(num_keypoints=self.cfg.num_keypoints,
                                              conv_dims=self.cfg.keypoint_conv_dims,
                                              dtype=self._compute_dtype())

    # ------------------------------------------------------------------ utils
    def _compute_dtype(self):
        return jnp.bfloat16 if self.cfg.amp_dtype == 'bfloat16' else jnp.float32

    def _features(self, images):
        '''images (B, S, S, 3) normalized -> FPN levels P2..P6 (NHWC).'''
        feats = self.backbone(images.astype(self._compute_dtype()))
        return self.fpn(feats)

    def _anchors(self, fpn_shapes):
        return [jnp.asarray(a) for a in generate_anchors(
            tuple((s[1], s[2]) for s in fpn_shapes), _FPN_STRIDES,
            self.cfg.anchor_sizes, self.cfg.anchor_aspect_ratios)]

    def _proposals(self, fpn_feats, image_sizes, train: bool):
        '''Batched proposal generation -> (boxes (B,P,4), valid (B,P)).'''
        logits, deltas = self.rpn_head(fpn_feats)
        anchors = self._anchors([f.shape for f in fpn_feats])
        pre_k = self.cfg.rpn_pre_nms_topk_train if train else self.cfg.rpn_pre_nms_topk_test
        post_k = self.cfg.rpn_post_nms_topk_train if train else self.cfg.rpn_post_nms_topk_test

        cap = None if train else (self.cfg.rpn_nms_global_cap or None)

        def per_image(img_logits, img_deltas, img_size):
            return select_proposals(anchors, img_logits, img_deltas,
                                    (img_size[0], img_size[1]),
                                    pre_k, post_k, self.cfg.rpn_nms_thresh,
                                    self.cfg.rpn_box_reg_weights,
                                    global_cap=cap)

        if cap is not None:
            # capped pool: the per-image IoU matrix is cap^2 (~4 MB), so the
            # whole batch's NMS vmaps into ONE batched program instead of a
            # sequential per-image loop (64 x ~0.2 ms of serialized matrix
            # builds at the uncapped 5000-candidate pool)
            boxes, scores, valid = jax.vmap(per_image)(
                [l for l in logits], [d for d in deltas], image_sizes)
        else:
            # lax.map (not vmap): the uncapped per-image NMS builds O(P^2)
            # IoU matrices whose batched materialization would blow HBM
            boxes, scores, valid = jax.lax.map(
                lambda args: per_image(args[0], args[1], args[2]),
                ([l for l in logits], [d for d in deltas], image_sizes))
        return boxes, scores, valid, (logits, deltas, anchors)

    # ------------------------------------------------------------------- init
    def init_params(self, images) -> None:
        '''Cheap forward that touches every submodule once, so
        ``model.init(rng, images, method=MaskKeypointRCNN.init_params)``
        yields the exact same parameter tree as the inference path without
        compiling proposals/NMS/ROIAlign (seconds instead of minutes on a
        tunneled device). ``images`` may be any (B, H, W, 3) with H, W
        divisible by 64 — param shapes are spatial-size independent.'''
        cfg = self.cfg
        fpn_feats = self._features(images)
        self.rpn_head(fpn_feats)
        c = fpn_feats[0].shape[-1]
        dt = fpn_feats[0].dtype
        r = cfg.box_pooler_resolution
        self.box_head(jnp.zeros((1, r, r, c), dt))
        if cfg.mask_on:
            m = cfg.mask_pooler_resolution
            self.mask_head(jnp.zeros((1, m, m, c), dt))
        if cfg.keypoint_on:
            k = cfg.keypoint_pooler_resolution
            self.keypoint_head(jnp.zeros((1, k, k, c), dt))

    # -------------------------------------------------------------- inference
    def inference(self, images, image_sizes=None) -> Dict[str, jnp.ndarray]:
        '''Full detection forward. images (B, S, S, 3) normalized float;
        image_sizes (B, 2 [h, w]) actual content sizes (defaults to canvas).

        Returns dict with per-image padded detections:
        boxes (B, D, 4), scores (B, D), classes (B, D), valid (B, D),
        masks (B, D, H, W) bool, mask_probs (B, D, 28, 28),
        keypoints (B, D, K, 3), keypoint_heatmaps (B, D, S', S', K).
        '''
        cfg = self.cfg
        b = images.shape[0]
        canvas = (images.shape[1], images.shape[2])
        if image_sizes is None:
            image_sizes = jnp.tile(jnp.asarray([canvas], jnp.float32), (b, 1))

        fpn_feats = self._features(images)
        proposals, _, prop_valid, _ = self._proposals(fpn_feats, image_sizes, train=False)

        # box head over all proposals (pooling = fused Pallas separable
        # ROIAlign, see _pool)
        p = proposals.shape[1]
        pooled = self._pool(fpn_feats, proposals, cfg.box_pooler_resolution)
        cls_logits, box_deltas = self.box_head(pooled.reshape(b * p, *pooled.shape[2:]))
        cls_logits = cls_logits.reshape(b, p, -1).astype(jnp.float32)
        box_deltas = box_deltas.reshape(b, p, 4).astype(jnp.float32)

        probs = jax.nn.softmax(cls_logits, axis=-1)
        fg_scores = probs[..., 0]  # single foreground class
        boxes = decode_boxes(box_deltas, proposals, cfg.box_reg_weights)

        def per_image_select(img_boxes, img_scores, img_valid, img_size):
            img_boxes = clip_boxes(img_boxes, (img_size[0], img_size[1]))
            valid = img_valid & (img_scores > cfg.test_score_thresh)
            keep = batched_nms_keep_mask(img_boxes, img_scores,
                                         jnp.zeros(img_boxes.shape[0], jnp.int32),
                                         cfg.test_nms_thresh, valid=valid)
            masked = jnp.where(keep, img_scores, -jnp.inf)
            top_scores, top_idx = jax.lax.top_k(masked, cfg.test_detections_per_image)
            det_valid = jnp.isfinite(top_scores)
            det_boxes = jnp.where(det_valid[:, None], img_boxes[top_idx], 0.0)
            return det_boxes, jnp.where(det_valid, top_scores, 0.0), det_valid

        # vmapped, not lax.map: the per-image work is a 256x256 IoU fixpoint
        # (16.8 MB f32 for the whole batch) — one fused while_loop over the
        # batch beats 64 sequential tiny NMS loops
        det_boxes, det_scores, det_valid = jax.vmap(per_image_select)(
            boxes, fg_scores, prop_valid, image_sizes)

        out = {
            'boxes': det_boxes, 'scores': det_scores,
            'classes': jnp.zeros(det_scores.shape, jnp.int32),
            'valid': det_valid,
        }

        if cfg.mask_on:
            mask_pooled = self._pool(fpn_feats, det_boxes, cfg.mask_pooler_resolution)
            d = det_boxes.shape[1]
            mask_logits = self.mask_head(
                mask_pooled.reshape(b * d, *mask_pooled.shape[2:]))
            mask_logits = mask_logits[..., 0].reshape(b, d, cfg.mask_resolution,
                                                      cfg.mask_resolution)
            out['mask_probs'] = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
            out['masks'] = jax.vmap(
                lambda ml, bx, v: paste_masks(ml, bx, canvas) & v[:, None, None])(
                    mask_logits, det_boxes, det_valid)

        if cfg.keypoint_on:
            kp_pooled = self._pool(fpn_feats, det_boxes, cfg.keypoint_pooler_resolution)
            d = det_boxes.shape[1]
            kp_logits = self.keypoint_head(
                kp_pooled.reshape(b * d, *kp_pooled.shape[2:]))
            s = kp_logits.shape[1]
            kp_logits = kp_logits.reshape(b, d, s, s, cfg.num_keypoints)
            out['keypoint_heatmaps'] = kp_logits.astype(jnp.float32)
            out['keypoints'] = jax.vmap(heatmaps_to_keypoints)(kp_logits, det_boxes)

        return out

    def _pool(self, fpn_feats, boxes, resolution: int, train: bool = False):
        '''Batched multilevel ROIAlign: boxes (B, K, 4) -> (B, K, r, r, C).

        Inference uses the fused Pallas separable-matmul kernel on bf16
        features (measured v5e at the 64x256-ROI box stage: 108 ms gather ->
        25.5 ms; see ops/pallas_roi_align.py) and returns bf16: the heads
        compute in bf16 anyway, and an f32 pooled tensor is 823 MB of HBM
        round-trip per batch-64 box stage (~2 ms) for precision the matmul
        never had. Training keeps the f32 gather path: it is differentiable,
        remat-bounded, and its exact numerics back the training regression
        tests.
        '''
        if train:
            p2_p5 = tuple(f.astype(jnp.float32) for f in fpn_feats[:4])
            return batched_multilevel_roi_align(
                p2_p5, boxes, resolution, chunk=128).astype(jnp.float32)
        p2_p5 = tuple(f.astype(jnp.bfloat16) for f in fpn_feats[:4])
        return pallas_separable_roi_align(p2_p5, boxes, resolution,
                                          out_dtype=jnp.bfloat16)

    # --------------------------------------------------------------- training
    def losses(self, images, gt: Dict[str, jnp.ndarray], rng,
               image_sizes=None) -> Dict[str, jnp.ndarray]:
        '''Training losses. gt holds padded tensors:
        boxes (B, G, 4), valid (B, G), masks (B, G, S, S) bool,
        keypoints (B, G, K, 3 [x, y, vis]).
        '''
        cfg = self.cfg
        b = images.shape[0]
        canvas = (images.shape[1], images.shape[2])
        if image_sizes is None:
            image_sizes = jnp.tile(jnp.asarray([canvas], jnp.float32), (b, 1))

        fpn_feats = self._features(images)
        proposals, _, prop_valid, (rpn_logits, rpn_deltas, anchors) = \
            self._proposals(fpn_feats, image_sizes, train=True)

        # ---- RPN losses
        anchors_cat = jnp.concatenate(anchors)
        logits_cat = jnp.concatenate([l.reshape(b, -1) for l in rpn_logits], axis=1)
        deltas_cat = jnp.concatenate([d.reshape(b, -1, 4) for d in rpn_deltas], axis=1)
        rng, rpn_rng = jax.random.split(rng)
        rpn_keys = jax.random.split(rpn_rng, b)

        def per_image_rpn(img_logits, img_deltas, img_gt, img_gt_valid, key):
            return rpn_losses(anchors_cat, img_logits.astype(jnp.float32),
                              img_deltas.astype(jnp.float32), img_gt, img_gt_valid,
                              key, cfg.rpn_batch_size_per_image,
                              cfg.rpn_positive_fraction, cfg.rpn_fg_iou_thresh,
                              cfg.rpn_bg_iou_thresh, cfg.rpn_box_reg_weights,
                              cfg.rpn_smooth_l1_beta)

        obj_loss, rpn_reg_loss = jax.vmap(per_image_rpn)(
            logits_cat, deltas_cat, gt['boxes'], gt['valid'], rpn_keys)
        normalizer = cfg.rpn_batch_size_per_image * b
        losses = {
            'loss_rpn_cls': jnp.sum(obj_loss) / normalizer,
            'loss_rpn_loc': jnp.sum(rpn_reg_loss) / normalizer,
        }

        # ---- sample proposals for ROI heads (append gt boxes like D2)
        # DETACH the proposals (D2 decodes them under torch.no_grad,
        # rpn.py predict_proposals). Without this, the head losses backprop
        # through ROIAlign's bilinear weights and the box coordinates into
        # the RPN deltas head, dragging proposals toward whatever warp helps
        # the heads memorize — observed as full-height slab proposals with
        # loss_rpn_loc climbing to ~0.46 while every head loss kept falling.
        proposals = jax.lax.stop_gradient(proposals)
        all_props = jnp.concatenate([proposals, gt['boxes']], axis=1)
        all_valid = jnp.concatenate([prop_valid, gt['valid']], axis=1)
        rng, roi_rng = jax.random.split(rng)
        roi_keys = jax.random.split(roi_rng, b)

        def per_image_sample(img_props, img_pvalid, img_gt, img_gt_valid, key):
            from moseq2_detectron_extract_tpu.ops.boxes import pairwise_iou
            iou = pairwise_iou(img_props, img_gt)
            iou = jnp.where(img_gt_valid[None, :], iou, -1.0)
            iou = jnp.where(img_pvalid[:, None], iou, -1.0)
            matched_iou = jnp.max(iou, axis=1)
            matched_idx = jnp.argmax(iou, axis=1)
            labels = jnp.where(matched_iou >= cfg.roi_fg_iou_thresh, 1, 0)
            labels = jnp.where(img_pvalid, labels, -1)  # padding: ignore
            idx, valid, is_pos = subsample_labels(labels, cfg.roi_batch_size_per_image,
                                                  cfg.roi_positive_fraction, key)
            return idx, valid, is_pos, matched_idx[idx]

        s_idx, s_valid, s_pos, s_gt_idx = jax.vmap(per_image_sample)(
            all_props, all_valid, gt['boxes'], gt['valid'], roi_keys)

        r = cfg.roi_batch_size_per_image
        batch_idx = jnp.arange(b)[:, None]
        s_boxes = all_props[batch_idx, s_idx]                     # (B, R, 4)
        s_gt_boxes = gt['boxes'][batch_idx, s_gt_idx]

        # ---- box head losses
        pooled = self._pool(fpn_feats, s_boxes, cfg.box_pooler_resolution, train=True)
        cls_logits, box_deltas = self.box_head(pooled.reshape(b * r, *pooled.shape[2:]))
        cls_logits = cls_logits.reshape(b, r, -1).astype(jnp.float32)
        box_deltas = box_deltas.reshape(b, r, 4).astype(jnp.float32)

        cls_targets = jnp.where(s_pos, 0, cfg.num_classes)  # fg class 0, bg = C
        ce = -jax.nn.log_softmax(cls_logits, axis=-1)
        cls_loss = jnp.take_along_axis(ce, cls_targets[..., None], axis=-1)[..., 0]
        cls_loss = jnp.sum(jnp.where(s_valid, cls_loss, 0.0))

        target_deltas = encode_boxes(s_boxes, s_gt_boxes, cfg.box_reg_weights)
        reg = _smooth_l1(box_deltas - target_deltas, cfg.box_smooth_l1_beta)
        reg_loss = jnp.sum(jnp.where(s_pos[..., None], reg, 0.0))
        num_sampled = jnp.maximum(jnp.sum(s_valid), 1)
        losses['loss_cls'] = cls_loss / num_sampled
        losses['loss_box_reg'] = reg_loss / num_sampled

        # ---- mask head loss (on positives only; heads run on all R rois,
        #      loss masked — static shapes beat dynamic gathers on TPU)
        if cfg.mask_on:
            mask_pooled = self._pool(fpn_feats, s_boxes, cfg.mask_pooler_resolution, train=True)
            mask_logits = self.mask_head(
                mask_pooled.reshape(b * r, *mask_pooled.shape[2:]))[..., 0]
            mask_logits = mask_logits.reshape(b, r, cfg.mask_resolution,
                                              cfg.mask_resolution).astype(jnp.float32)

            # crop gt bitmasks to the sampled boxes at mask resolution
            def per_image_targets(img_masks, img_gt_idx, img_boxes):
                sel = img_masks[img_gt_idx]  # (R, S, S)
                return jax.vmap(lambda m, bx: crop_resize_mask(
                    m, bx, cfg.mask_resolution))(sel, img_boxes)

            mask_targets = jax.vmap(per_image_targets)(
                gt['masks'], s_gt_idx, s_boxes) >= 0.5
            mloss = _bce_with_logits(mask_logits, mask_targets.astype(jnp.float32))
            mloss = jnp.where(s_pos[..., None, None], mloss, 0.0)
            num_pos = jnp.maximum(jnp.sum(s_pos), 1)
            losses['loss_mask'] = jnp.sum(mloss) / (num_pos * cfg.mask_resolution ** 2)

        # ---- keypoint head loss
        if cfg.keypoint_on:
            kp_pooled = self._pool(fpn_feats, s_boxes, cfg.keypoint_pooler_resolution, train=True)
            kp_logits = self.keypoint_head(
                kp_pooled.reshape(b * r, *kp_pooled.shape[2:]))
            hs = kp_logits.shape[1]
            kp_logits = kp_logits.reshape(b, r, hs, hs, cfg.num_keypoints)
            kp_logits = jnp.transpose(kp_logits, (0, 1, 4, 2, 3)).reshape(
                b, r, cfg.num_keypoints, hs * hs).astype(jnp.float32)

            gt_kpts = gt['keypoints'][batch_idx, s_gt_idx]        # (B, R, K, 3)
            tgt_idx, tgt_valid = jax.vmap(
                lambda kk, bb: keypoint_targets(kk, bb, hs))(gt_kpts, s_boxes)
            tgt_valid = tgt_valid & s_pos[..., None]

            logp = jax.nn.log_softmax(kp_logits, axis=-1)
            kp_ce = -jnp.take_along_axis(logp, tgt_idx[..., None], axis=-1)[..., 0]
            num_visible = jnp.maximum(jnp.sum(tgt_valid), 1)
            losses['loss_keypoint'] = jnp.sum(jnp.where(tgt_valid, kp_ce, 0.0)) / num_visible

        losses['total_loss'] = sum(losses.values())
        return losses
