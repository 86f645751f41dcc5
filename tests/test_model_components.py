'''Unit tests of model building blocks vs numpy oracles.'''
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moseq2_detectron_extract_tpu.models.anchors import generate_anchors
from moseq2_detectron_extract_tpu.ops.boxes import (clip_boxes, decode_boxes,
                                                       encode_boxes, pairwise_iou)
from moseq2_detectron_extract_tpu.models.heads import (heatmaps_to_keypoints,
                                                       keypoint_targets, paste_masks)
from moseq2_detectron_extract_tpu.models.matcher import (match_anchors_to_gt,
                                                         subsample_labels)
from moseq2_detectron_extract_tpu.ops.instances import gather_selected, nms_and_centers
from moseq2_detectron_extract_tpu.ops.nms import nms_keep_mask
from moseq2_detectron_extract_tpu.ops.pallas_roi_align import pallas_separable_roi_align
from moseq2_detectron_extract_tpu.ops.roi_align import (batched_multilevel_roi_align,
                                                        crop_resize_mask,
                                                        multilevel_roi_align,
                                                        separable_batched_roi_align)


def greedy_nms_oracle(boxes, scores, thresh):
    '''Classic greedy NMS in numpy (torchvision semantics).'''
    order = np.argsort(-scores, kind='stable')
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if j == i or suppressed[j] or keep[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-9) > thresh:
                suppressed[j] = True
    return keep


class TestNMS:
    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_matches_greedy_oracle(self, seed):
        rng = np.random.default_rng(seed)
        n = 60
        centers = rng.uniform(20, 100, (n, 2))
        sizes = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1).astype('float32')
        scores = rng.uniform(0, 1, n).astype('float32')
        keep = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        oracle = greedy_nms_oracle(boxes, scores, 0.5)
        np.testing.assert_array_equal(keep, oracle)

    def test_valid_mask_respected(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.asarray([0.5, 0.9])
        valid = jnp.asarray([True, False])
        keep = np.asarray(nms_keep_mask(boxes, scores, 0.5, valid=valid))
        np.testing.assert_array_equal(keep, [True, False])


class TestSelectProposalsGlobalCap:
    '''The test-time global NMS candidate cap must be exact: greedy NMS
    decides each box only from higher-ranked boxes, so capping the pool to
    the global top-K cannot change which of those boxes are kept.'''

    def _random_inputs(self, seed, n_anchors=(96, 48, 24)):
        from moseq2_detectron_extract_tpu.models.rpn import select_proposals
        rng = np.random.default_rng(seed)
        anchors, logits, deltas = [], [], []
        for n in n_anchors:
            centers = rng.uniform(30, 200, (n, 2))
            sizes = rng.uniform(10, 60, (n, 2))
            anchors.append(jnp.asarray(np.concatenate(
                [centers - sizes / 2, centers + sizes / 2], axis=1), jnp.float32))
            logits.append(jnp.asarray(rng.normal(0, 2, n), jnp.float32))
            deltas.append(jnp.asarray(rng.normal(0, 0.1, (n, 4)), jnp.float32))
        return select_proposals, anchors, logits, deltas

    @pytest.mark.parametrize('seed', [0, 1])
    def test_capped_equals_uncapped(self, seed):
        fn, anchors, logits, deltas = self._random_inputs(seed)
        kwargs = dict(image_size=(256, 256), pre_nms_topk=64, post_nms_topk=32,
                      nms_thresh=0.7, box_reg_weights=(1.0, 1.0, 1.0, 1.0))
        b0, s0, v0 = fn(anchors, logits, deltas, **kwargs)
        b1, s1, v1 = fn(anchors, logits, deltas, global_cap=96, **kwargs)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))
        np.testing.assert_allclose(np.asarray(b0), np.asarray(b1))

    @pytest.mark.parametrize('seed', [0, 5])
    def test_level_k_clamp_exact(self, seed):
        # with a global cap, per-level pre-NMS k beyond the cap never reaches
        # the candidate pool (absent empty decoded boxes in a level's
        # top-cap): the clamped fast path must equal the unclamped one
        fn, anchors, logits, deltas = self._random_inputs(
            seed, n_anchors=(256, 128, 64))
        kwargs = dict(image_size=(256, 256), pre_nms_topk=128,
                      post_nms_topk=16, nms_thresh=0.7,
                      box_reg_weights=(1.0, 1.0, 1.0, 1.0), global_cap=48)
        b0, s0, v0 = fn(anchors, logits, deltas, _clamp_level_k=False,
                        **kwargs)
        b1, s1, v1 = fn(anchors, logits, deltas, **kwargs)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))
        np.testing.assert_allclose(np.asarray(b0), np.asarray(b1))

    def test_level_k_clamp_empty_box_edge_case(self):
        # pins the DOCUMENTED deviation scenario of the clamp (rpn.py:68-75):
        # when a level's top-``cap`` scored candidates decode to EMPTY boxes,
        # valid candidates ranked below them reach the global pool only in
        # the unclamped run. The clamp trades those away; this test makes the
        # assumption executable so a future NMS/validity refactor that widens
        # (or silently changes) the deviation fires here instead of shipping.
        from moseq2_detectron_extract_tpu.models.rpn import select_proposals
        cap = 32
        # top-`cap` scores all decode to boxes fully outside the image
        # (clip -> zero area); the next 32 are valid in-image boxes
        out_centers = np.full((cap, 2), -50.0)
        in_centers = np.stack([np.linspace(40, 200, 32),
                               np.linspace(40, 200, 32)], axis=1)
        centers = np.concatenate([out_centers, in_centers])
        sizes = np.full((64, 2), 20.0)
        anchors = [jnp.asarray(np.concatenate(
            [centers - sizes / 2, centers + sizes / 2], axis=1), jnp.float32)]
        logits = [jnp.asarray(np.concatenate(
            [np.full(cap, 5.0), np.full(32, 1.0)]), jnp.float32)]
        deltas = [jnp.zeros((64, 4), jnp.float32)]
        kwargs = dict(image_size=(256, 256), pre_nms_topk=64, post_nms_topk=8,
                      nms_thresh=0.7, box_reg_weights=(1.0, 1.0, 1.0, 1.0),
                      global_cap=cap)
        b0, s0, v0 = select_proposals(anchors, logits, deltas,
                                      _clamp_level_k=False, **kwargs)
        b1, s1, v1 = select_proposals(anchors, logits, deltas, **kwargs)
        # unclamped: the valid boxes below the empties reach the pool
        assert int(np.asarray(v0).sum()) == 8
        # clamped: the level contributes only the empty top-cap boxes -> no
        # valid proposals. Invalid rows must still be well-formed zeros.
        assert int(np.asarray(v1).sum()) == 0
        np.testing.assert_array_equal(np.asarray(b1), 0.0)
        np.testing.assert_array_equal(np.asarray(s1), 0.0)

    def test_tied_scores_keep_order(self):
        fn, anchors, logits, deltas = self._random_inputs(3)
        # quantize scores so ties are common; the stable top_k + index
        # tie-break must agree between capped and uncapped runs
        logits = [jnp.round(l) for l in logits]
        kwargs = dict(image_size=(256, 256), pre_nms_topk=64, post_nms_topk=32,
                      nms_thresh=0.7, box_reg_weights=(1.0, 1.0, 1.0, 1.0))
        b0, s0, v0 = fn(anchors, logits, deltas, **kwargs)
        b1, s1, v1 = fn(anchors, logits, deltas, global_cap=128, **kwargs)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_allclose(np.asarray(b0), np.asarray(b1))


class TestBoxes:
    def test_encode_decode_round_trip(self, rng):
        src = rng.uniform(0, 100, (20, 2))
        src = np.concatenate([src, src + rng.uniform(5, 50, (20, 2))], axis=1)
        tgt = rng.uniform(0, 100, (20, 2))
        tgt = np.concatenate([tgt, tgt + rng.uniform(5, 50, (20, 2))], axis=1)
        weights = (10.0, 10.0, 5.0, 5.0)
        deltas = encode_boxes(jnp.asarray(src), jnp.asarray(tgt), weights)
        restored = decode_boxes(deltas, jnp.asarray(src), weights)
        np.testing.assert_allclose(np.asarray(restored), tgt, atol=1e-2)

    def test_pairwise_iou(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(pairwise_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)

    def test_clip(self):
        boxes = jnp.asarray([[-5, -5, 300, 60]], jnp.float32)
        out = np.asarray(clip_boxes(boxes, (100, 200)))
        np.testing.assert_allclose(out, [[0, 0, 200, 60]])


class TestAnchors:
    def test_shapes_and_centers(self):
        anchors = generate_anchors(((4, 4),), (16,), ((32,),), (1.0,))
        a = anchors[0]
        assert a.shape == (16, 1 * 4)[0:1] + (4,)
        # first anchor centered at (0, 0) with size 32
        np.testing.assert_allclose(a[0], [-16, -16, 16, 16])
        # second anchor shifted one stride in x
        np.testing.assert_allclose(a[1], [0, -16, 32, 16])

    def test_aspect_ratios(self):
        anchors = generate_anchors(((1, 1),), (16,), ((32,),), (0.5, 1.0, 2.0))[0]
        widths = anchors[:, 2] - anchors[:, 0]
        heights = anchors[:, 3] - anchors[:, 1]
        np.testing.assert_allclose(heights / widths, [0.5, 1.0, 2.0], rtol=1e-6)
        np.testing.assert_allclose(widths * heights, 32 * 32, rtol=1e-6)


class TestMatcher:
    def test_match_labels(self):
        anchors = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110],
                               [0, 0, 9, 10], [50, 50, 52, 52]], jnp.float32)
        gt = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
        gt_valid = jnp.asarray([True, False])
        idx, labels = match_anchors_to_gt(anchors, gt, gt_valid, 0.7, 0.3, True)
        labels = np.asarray(labels)
        assert labels[0] == 1      # perfect match
        assert labels[1] == 0      # no overlap -> bg
        assert labels[2] == 1      # iou 0.9 -> fg
        assert labels[3] == 0

    def test_low_quality_forced_positive(self):
        anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        gt = jnp.asarray([[0, 0, 30, 30]], jnp.float32)
        gt_valid = jnp.asarray([True])
        _, labels = match_anchors_to_gt(anchors, gt, gt_valid, 0.7, 0.3, True)
        assert np.asarray(labels)[0] == 1  # best anchor for the gt is forced fg

    def test_subsample_balance(self):
        labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 20)
        idx, valid, is_pos = subsample_labels(labels, 32, 0.5, jax.random.PRNGKey(0))
        idx, valid, is_pos = map(np.asarray, (idx, valid, is_pos))
        assert valid.sum() == 32
        assert is_pos.sum() == 10          # all positives (< cap of 16)
        assert (valid & ~is_pos).sum() == 22

    def test_subsample_caps_positives(self):
        labels = jnp.asarray([1] * 100 + [0] * 100)
        idx, valid, is_pos = subsample_labels(labels, 32, 0.5, jax.random.PRNGKey(0))
        assert np.asarray(is_pos).sum() == 16


class TestRoiAlign:
    def test_constant_map_pools_constant(self):
        feat = jnp.full((1, 16, 16, 8), 3.0)
        boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])  # image coords, stride 4
        out = batched_multilevel_roi_align((feat,), boxes, 7, min_level=2)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)

    def test_linear_ramp_center_values(self):
        # feature = x coordinate; pooling a box should reproduce bin centers
        xs = np.tile(np.arange(16, dtype='float32'), (16, 1))
        feat = jnp.asarray(xs[None, :, :, None])
        boxes = jnp.asarray([[[4 * 4.0, 4 * 4.0, 12 * 4.0, 12 * 4.0]]])  # stride 4
        out = np.asarray(batched_multilevel_roi_align((feat,), boxes, 4,
                                                      min_level=2))[0, 0, ..., 0]
        # box covers feature coords [3.5, 11.5]; 4 bins of width 2 ->
        # bin centers at 4.5, 6.5, 8.5, 10.5
        np.testing.assert_allclose(out[0], [4.5, 6.5, 8.5, 10.5], atol=1e-4)

    def test_level_assignment_multilevel(self):
        # small box -> P2, large box -> P5
        feats = tuple(jnp.full((1, s, s, 4), float(i)) for i, s in
                      enumerate((64, 32, 16, 8)))
        boxes = jnp.asarray([[[0, 0, 20, 20], [0, 0, 448, 448]]], jnp.float32)
        out = np.asarray(batched_multilevel_roi_align(feats, boxes, 7))
        assert out[0, 0].mean() == pytest.approx(0.0, abs=1e-5)   # level P2
        # sqrt(448^2) / 224 = 2 -> canonical level 4 + 1 = P5
        assert out[0, 1].mean() == pytest.approx(3.0, abs=1e-5)

    def _random_pyramid(self, b=3, k=37, c=16, canvas=256, seed=0):
        rng = np.random.default_rng(seed)
        feats = tuple(jnp.asarray(rng.normal(0, 1, (
            b, canvas // (4 * 2 ** l), canvas // (4 * 2 ** l), c)
        ).astype('float32')) for l in range(4))
        cx = rng.uniform(0, 250, (b, k))
        cy = rng.uniform(0, 250, (b, k))
        wh = rng.uniform(2, 300, (b, k, 2))
        boxes = jnp.asarray(np.stack(
            [cx - wh[..., 0] / 2, cy - wh[..., 1] / 2,
             cx + wh[..., 0] / 2, cy + wh[..., 1] / 2], -1).astype('float32'))
        return feats, boxes

    def test_separable_matches_gather_exactly(self):
        # the matmul formulation is algebraically identical to the gather
        # path; at HIGHEST precision the results agree to f32 rounding
        feats, boxes = self._random_pyramid()
        ref = np.asarray(batched_multilevel_roi_align(feats, boxes, 7))
        out = np.asarray(separable_batched_roi_align(
            feats, boxes, 7, precision=jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_separable_chunked_and_degenerate(self):
        feats, boxes = self._random_pyramid(k=19)
        hp = jax.lax.Precision.HIGHEST
        ref = np.asarray(batched_multilevel_roi_align(feats, boxes, 7))
        out = np.asarray(separable_batched_roi_align(feats, boxes, 7,
                                                     k_chunk=8, precision=hp))
        np.testing.assert_allclose(out, ref, atol=1e-5)
        zb = jnp.zeros((feats[0].shape[0], 4, 4))
        np.testing.assert_allclose(
            np.asarray(separable_batched_roi_align(feats, zb, 7, precision=hp)),
            np.asarray(batched_multilevel_roi_align(feats, zb, 7)), atol=1e-5)

    def test_separable_gradients_match_gather(self):
        feats, boxes = self._random_pyramid(b=2, k=9)
        hp = jax.lax.Precision.HIGHEST

        def loss_g(bx, f0):
            return jnp.sum(batched_multilevel_roi_align((f0,) + feats[1:], bx, 7) ** 2)

        def loss_s(bx, f0):
            return jnp.sum(separable_batched_roi_align(
                (f0,) + feats[1:], bx, 7, k_chunk=4, precision=hp) ** 2)

        gb1, gf1 = jax.grad(loss_g, argnums=(0, 1))(boxes, feats[0])
        gb2, gf2 = jax.grad(loss_s, argnums=(0, 1))(boxes, feats[0])
        np.testing.assert_allclose(np.asarray(gb2), np.asarray(gb1),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gf2), np.asarray(gf1),
                                   rtol=1e-4, atol=1e-3)

    def test_pallas_wrapper_matches(self):
        # off-TPU the wrapper dispatches to the XLA separable formulation;
        # on TPU it runs the fused kernel (bf16-matmul tolerance)
        feats, boxes = self._random_pyramid(k=21)
        ref = np.asarray(batched_multilevel_roi_align(feats, boxes, 7))
        out = np.asarray(pallas_separable_roi_align(feats, boxes, 7))
        tol = 5e-2 if jax.default_backend() == 'tpu' else 1e-2
        np.testing.assert_allclose(out, ref, atol=tol)

    def test_pallas_kernel_unaligned_h_total(self):
        # canvas 192 stacks the pyramid to h_total=90 (not sublane-aligned);
        # the kernel zero-pads the stacked height — run the REAL kernel math
        # via interpret mode so the alignment path is covered off-TPU
        # (regression: Mosaic 'slice must be aligned to tiling (8)' at the
        # fast-variant canvas)
        feats, boxes = self._random_pyramid(b=2, k=8, canvas=192)
        assert sum(f.shape[1] for f in feats) % 8 != 0
        ref = np.asarray(batched_multilevel_roi_align(feats, boxes, 7))
        out = np.asarray(pallas_separable_roi_align(
            feats, boxes, 7, interpret=True, block_k=8))
        np.testing.assert_allclose(out, ref, atol=1e-2)

    def test_crop_resize_mask(self):
        mask = np.zeros((32, 32), bool)
        mask[8:24, 8:24] = True
        out = np.asarray(crop_resize_mask(jnp.asarray(mask),
                                          jnp.asarray([8.0, 8.0, 24.0, 24.0]), 8))
        assert (out > 0.5).mean() > 0.9


class TestHeads:
    def test_heatmaps_to_keypoints(self):
        d, s, k = 1, 8, 2
        hm = np.full((d, s, s, k), -10.0, dtype='float32')
        hm[0, 2, 5, 0] = 10.0   # keypoint 0 at bin (y=2, x=5)
        hm[0, 7, 0, 1] = 10.0
        boxes = jnp.asarray([[0.0, 0.0, 80.0, 80.0]])
        kps = np.asarray(heatmaps_to_keypoints(jnp.asarray(hm), boxes))
        np.testing.assert_allclose(kps[0, 0, :2], [(5 + .5) * 10, (2 + .5) * 10])
        np.testing.assert_allclose(kps[0, 1, :2], [5.0, 75.0])
        assert (kps[..., 2] > 0.9).all()

    def test_keypoint_targets(self):
        kpts = jnp.asarray([[[10.0, 10.0, 2.0], [200.0, 10.0, 2.0],
                             [15.0, 15.0, 0.0]]])
        boxes = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
        idx, valid = keypoint_targets(kpts, boxes, 14)
        valid = np.asarray(valid)[0]
        assert valid[0] and not valid[1] and not valid[2]
        # (10, 10) in a 20x20 box -> bin (7, 7)
        assert np.asarray(idx)[0, 0] == 7 * 14 + 7

    def test_paste_masks(self):
        logits = jnp.full((1, 28, 28), 10.0)
        boxes = jnp.asarray([[10.0, 20.0, 40.0, 50.0]])
        out = np.asarray(paste_masks(logits, boxes, (64, 64)))
        assert out[0, 35, 25]           # inside the box
        assert not out[0, 5, 5]         # outside
        assert not out[0, 60, 60]


class TestInstanceSelection:
    def test_nms_and_centers(self):
        n, d, h, w = 2, 3, 16, 16
        masks = np.zeros((n, d, h, w), bool)
        masks[0, 0, 2:10, 2:10] = True      # big blob
        masks[0, 1, 3:9, 3:9] = True        # heavily overlapping
        masks[0, 2, 12:15, 12:15] = True    # separate blob
        scores = np.array([[0.9, 0.8, 0.7], [0.5, 0.0, 0.0]])
        valid = np.array([[True, True, True], [True, False, False]])
        keep, centers, _iou = nms_and_centers(jnp.asarray(masks), jnp.asarray(scores),
                                              jnp.asarray(valid))
        keep = np.asarray(keep)
        assert keep[0].tolist() == [True, False, True]
        assert not keep[1].any()  # frame 1 mask 0 is empty
        c = np.asarray(centers)
        np.testing.assert_allclose(c[0, 0], [5.5, 5.5], atol=1e-5)

    def test_gather_selected(self):
        masks = jnp.zeros((2, 2, 4, 4), bool).at[0, 1, 1, 1].set(True)
        kpts = jnp.arange(2 * 2 * 3 * 3, dtype=jnp.float32).reshape(2, 2, 3, 3)
        sel_m, sel_k = gather_selected(masks, kpts, jnp.asarray([1, 0]),
                                       jnp.asarray([True, False]))
        assert np.asarray(sel_m)[0, 1, 1] == 1
        assert np.isnan(np.asarray(sel_k)[1]).all()


class TestInitParams:
    def test_init_params_tree_matches_inference(self):
        '''The cheap ``init_params`` path (used by convert-weights and tooling
        that only needs a parameter template) must yield the exact same
        parameter tree as initializing through the full inference graph.'''
        import jax.tree_util as jtu
        from moseq2_detectron_extract_tpu.models.config import ModelConfig
        from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN
        cfg = ModelConfig(
            image_size=64, resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16,
            fpn_channels=32, box_fc_dim=32, mask_conv_dims=(16,),
            keypoint_conv_dims=(16,), rpn_pre_nms_topk_test=16,
            rpn_post_nms_topk_test=8, test_detections_per_image=2)
        model = MaskKeypointRCNN(cfg)
        images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        s_cheap = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), images, method=MaskKeypointRCNN.init_params))
        s_full = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), images, method=MaskKeypointRCNN.inference))
        t1 = {jtu.keystr(k): (v.shape, v.dtype)
              for k, v in jtu.tree_leaves_with_path(s_cheap)}
        t2 = {jtu.keystr(k): (v.shape, v.dtype)
              for k, v in jtu.tree_leaves_with_path(s_full)}
        assert t1 == t2


class TestPredictorFusedSelect:
    def test_select_outputs_match_separate_nms(self):
        '''Predictor(select=True) fuses nms_and_centers into the chunk
        program; its keep/centers/mask_iou must equal the separate-dispatch
        path applied to the returned masks.'''
        from moseq2_detectron_extract_tpu.models.config import ModelConfig
        from moseq2_detectron_extract_tpu.models.predictor import Predictor
        from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN
        from moseq2_detectron_extract_tpu.ops.instances import nms_and_centers
        cfg = ModelConfig(
            image_size=64, resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16,
            fpn_channels=32, box_fc_dim=32, mask_conv_dims=(16,),
            keypoint_conv_dims=(16,), rpn_pre_nms_topk_test=16,
            rpn_post_nms_topk_test=8, test_detections_per_image=2,
            test_score_thresh=0.0)
        model = MaskKeypointRCNN(cfg)
        images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images,
                            method=MaskKeypointRCNN.inference)
        pred = Predictor(cfg, params, batch_size=2)
        frames = (np.linspace(0, 255, 4 * 60 * 62)
                  .reshape(4, 60, 62).astype('uint8'))
        out = pred(frames, return_device=True, select=True)
        assert {'keep', 'centers', 'mask_iou'} <= set(out)
        keep2, centers2, iou2 = nms_and_centers(
            jnp.asarray(out['masks']), jnp.asarray(out['scores']),
            jnp.asarray(out['valid']))
        np.testing.assert_array_equal(np.asarray(out['keep']),
                                      np.asarray(keep2))
        np.testing.assert_allclose(np.asarray(out['centers']),
                                   np.asarray(centers2), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out['mask_iou']),
                                   np.asarray(iou2), rtol=1e-5, atol=1e-5)

    def test_select_false_has_no_extras(self):
        from moseq2_detectron_extract_tpu.models.config import ModelConfig
        from moseq2_detectron_extract_tpu.models.predictor import Predictor
        from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN
        cfg = ModelConfig(
            image_size=64, resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16,
            fpn_channels=32, box_fc_dim=32, mask_conv_dims=(16,),
            keypoint_conv_dims=(16,), rpn_pre_nms_topk_test=16,
            rpn_post_nms_topk_test=8, test_detections_per_image=2)
        model = MaskKeypointRCNN(cfg)
        images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images,
                            method=MaskKeypointRCNN.inference)
        pred = Predictor(cfg, params, batch_size=2)
        frames = np.zeros((2, 60, 62), 'uint8')
        out = pred(frames, return_device=True)
        assert 'keep' not in out


class TestPrescaledPredictor:
    def _cfg(self, **kw):
        from moseq2_detectron_extract_tpu.models.config import ModelConfig
        base = dict(
            image_size=64, resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16,
            fpn_channels=32, box_fc_dim=32, mask_conv_dims=(16,),
            keypoint_conv_dims=(16,), rpn_pre_nms_topk_test=16,
            rpn_post_nms_topk_test=8, test_detections_per_image=2,
            test_score_thresh=0.0)
        base.update(kw)
        return ModelConfig(**base)

    def test_scale_one_matches_full_path(self):
        '''With ResizeShortestEdge scale == 1 both paths feed the model the
        same pixels, so prescaled outputs must match the full path.'''
        from moseq2_detectron_extract_tpu.models.predictor import Predictor
        from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN
        from moseq2_detectron_extract_tpu.ops.preprocess import (
            compute_test_scale, prescale_frames_host)
        cfg = self._cfg(min_size_test=48, max_size_test=64)
        assert compute_test_scale(48, 60, 48, 64) == 1.0
        model = MaskKeypointRCNN(cfg)
        images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images,
                            method=MaskKeypointRCNN.inference)
        pred = Predictor(cfg, params, batch_size=2)
        frames = (np.linspace(0, 255, 4 * 48 * 60)
                  .reshape(4, 48, 60).astype('uint8'))
        full = pred(frames, return_device=True, select=True)
        # identity intensity scale: vmin=0, vmax=255
        canvas = prescale_frames_host(frames, cfg, vmin=0, vmax=255)
        pre = pred.predict_prescaled(canvas, (48, 60), select=True)
        for k in ('boxes', 'scores', 'valid', 'keypoints', 'keep', 'centers'):
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(full[k], dtype='float32')),
                np.nan_to_num(np.asarray(pre[k], dtype='float32')),
                rtol=2e-4, atol=2e-3, err_msg=k)

    def test_prescale_leaves_input_unmodified_and_fills(self):
        from moseq2_detectron_extract_tpu.ops.preprocess import (
            fill_sentinels_host, prescale_frames_host)
        cfg = self._cfg(min_size_test=32, max_size_test=40)
        frames = np.full((2, 48, 60), 50, 'uint8')
        frames[0, 10, 10] = 255  # dropout sentinel
        orig = frames.copy()
        out = prescale_frames_host(frames, cfg, vmin=0, vmax=100,
                                   fill_sentinel=255)
        np.testing.assert_array_equal(frames, orig)  # input untouched
        assert out.shape == (2, cfg.image_size, cfg.image_size)
        # 50 scaled by 255/100 -> 127; the filled dropout must not leak 255
        assert out.max() <= 128
        # direct fill check: sentinel takes the row-carried neighbor
        f2 = np.full((1, 4, 4), 7, 'uint8')
        f2[0, 1, 2] = 255
        filled = fill_sentinels_host(f2.copy(), 255)
        assert filled[0, 1, 2] == 7

