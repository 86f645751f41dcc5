'''Golden-value validation of the hand-rolled COCO AP (VERDICT r1 item 7).

pycocotools cannot run in this image, so every expected value below is
derived BY HAND from the pycocotools cocoeval.py algorithm (greedy
score-ordered matching, maxDets truncation, area-range ignore semantics,
101-point step-lookup AP) and written out with its derivation. Tolerance
1e-4 on the 0-100 scale.

Reference delegation point: m2de/model/eval.py:43-56 (COCOEvaluator).
'''
import numpy as np
import pytest

from moseq2_detectron_extract_tpu.models.eval import (AREA_RANGES,
                                                      IOU_THRESHOLDS,
                                                      evaluate_predictions)

SIGMAS4 = [0.25, 0.25, 0.25, 0.25]
H = W = 128


def rect_mask(x0, y0, x1, y1, h=H, w=W):
    m = np.zeros((h, w), bool)
    m[int(y0):int(y1), int(x0):int(x1)] = True
    return m


def make_item(boxes, kpts=None):
    '''GT item: each box becomes one annotation with a filled-rect mask.'''
    annots = []
    for i, box in enumerate(boxes):
        annot = {
            'bbox': list(map(float, box)),
            'segmentation': rect_mask(*box),
        }
        if kpts is not None:
            annot['keypoints'] = np.asarray(kpts[i], float).ravel().tolist()
        annots.append(annot)
    return {'height': H, 'width': W, 'file_name': '<mem>', 'annotations': annots}


def make_pred(boxes, scores, masks=None, kpts=None, nkp=4):
    boxes = np.asarray(boxes, float).reshape(-1, 4)
    d = len(boxes)
    if masks is None:
        masks = np.stack([rect_mask(*b) for b in boxes]) if d else \
            np.zeros((0, H, W), bool)
    if kpts is None:
        kpts = np.stack([_center_kpts(b, nkp) for b in boxes]) if d else \
            np.zeros((0, nkp, 3))
    return {'boxes': boxes, 'scores': np.asarray(scores, float),
            'valid': np.ones(d, bool), 'masks': np.asarray(masks),
            'keypoints': np.asarray(kpts, float)}


def _center_kpts(box, nkp):
    cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
    return np.tile([cx, cy, 2.0], (nkp, 1))


def gt_kpts_for(boxes, nkp=4):
    return [_center_kpts(b, nkp) for b in boxes]


class TestIoUThresholds:
    def test_thresholds_match_cocoeval_params(self):
        np.testing.assert_allclose(IOU_THRESHOLDS,
                                   np.linspace(0.5, 0.95, 10), atol=0)
        assert AREA_RANGES['medium'] == (32.0 ** 2, 96.0 ** 2)


class TestPerfect:
    def test_perfect_predictions_are_ap100(self):
        '''2 exact matches -> precision 1 at recall 1 at every threshold:
        AP = AP50 = AP75 = 100 for bbox/segm/keypoints.'''
        boxes = [(8, 8, 48, 48), (70, 70, 110, 110)]  # mask areas 1600: medium
        item = make_item(boxes, gt_kpts_for(boxes))
        pred = make_pred(boxes, [0.9, 0.8])
        res = evaluate_predictions([item], [pred], SIGMAS4)
        for task in ('bbox', 'segm', 'keypoints'):
            assert res[task]['AP'] == pytest.approx(100.0, abs=1e-4), task
            assert res[task]['AP50'] == pytest.approx(100.0, abs=1e-4)
            assert res[task]['AP75'] == pytest.approx(100.0, abs=1e-4)
        # both GT are medium-sized: small/large ranges hold no GT -> -1
        assert res['bbox']['APm'] == pytest.approx(100.0, abs=1e-4)
        assert res['bbox']['APs'] == -1.0
        assert res['bbox']['APl'] == -1.0
        assert res['keypoints']['APm'] == pytest.approx(100.0, abs=1e-4)


class TestPrecisionRecallCurve:
    def test_tp_fp_tp_curve(self):
        '''2 GT; detections in score order TP(0.9), FP(0.8), TP(0.7).

        cum_tp = [1,1,2], cum_fp = [0,1,1] -> recall [.5,.5,1],
        precision [1,.5,2/3] -> envelope [1,2/3,2/3]. Step lookup:
        51 recall points <= 0.50 read precision 1.0, the remaining 50 read
        2/3. AP = (51*1 + 50*2/3)/101 = 0.83498350 -> 83.49835 at every
        IoU threshold (matches are exact), so AP = AP50 = AP75.
        '''
        expected = (51 * 1.0 + 50 * (2 / 3)) / 101 * 100
        boxes = [(0, 0, 10, 10), (20, 20, 30, 30)]
        item = make_item(boxes, gt_kpts_for(boxes))
        pred = make_pred([boxes[0], (40, 40, 50, 50), boxes[1]],
                         [0.9, 0.8, 0.7],
                         kpts=np.stack([_center_kpts(boxes[0], 4),
                                        _center_kpts((40, 40, 50, 50), 4),
                                        _center_kpts(boxes[1], 4)]))
        res = evaluate_predictions([item], [pred], SIGMAS4)
        for task in ('bbox', 'segm', 'keypoints'):
            assert res[task]['AP'] == pytest.approx(expected, abs=1e-4), task
            assert res[task]['AP50'] == pytest.approx(expected, abs=1e-4)
            assert res[task]['AP75'] == pytest.approx(expected, abs=1e-4)
        # both GT have area 100 (< 32^2): the small range sees the same
        # curve (the FP detection's own area 100 is in-range, so it still
        # counts as FP); medium/large have no GT
        assert res['bbox']['APs'] == pytest.approx(expected, abs=1e-4)
        assert res['bbox']['APm'] == -1.0
        assert res['bbox']['APl'] == -1.0


class TestMaxDets:
    def test_maxdets_truncates_before_matching(self):
        '''2 GT, 2 perfect detections, maxDets=1: only the top-scoring
        detection survives -> recall caps at 0.5 with precision 1.
        AP = 51/101 = 0.50495050 -> 50.49505.'''
        expected = 51 / 101 * 100
        boxes = [(8, 8, 48, 48), (70, 70, 110, 110)]
        item = make_item(boxes, gt_kpts_for(boxes))
        pred = make_pred(boxes, [0.9, 0.8])
        res = evaluate_predictions([item], [pred], SIGMAS4,
                                   max_dets=1, kp_max_dets=1)
        for task in ('bbox', 'segm', 'keypoints'):
            assert res[task]['AP'] == pytest.approx(expected, abs=1e-4), task


class TestIoUSweep:
    def test_iou_064_passes_exactly_three_thresholds(self):
        '''1 GT [0,0,10,10]; 1 detection [0,0,10,6.4]: intersection 64,
        union 100 -> IoU 0.64. TP at thresholds .50/.55/.60 (AP 1 each),
        FP at .65..-.95 (AP 0) -> mean AP 30.0; AP50 = 100, AP75 = 0.
        The prediction mask is the matching 64-px rectangle so segm sees
        the same 0.64.'''
        gt_box = (0, 0, 10, 10)
        item = make_item([gt_box])
        pred = make_pred([(0, 0, 10, 6.4)], [0.9],
                         masks=rect_mask(0, 0, 10, 6.4)[None])
        res = evaluate_predictions([item], [pred], SIGMAS4)
        for task in ('bbox', 'segm'):
            assert res[task]['AP'] == pytest.approx(30.0, abs=1e-4), task
            assert res[task]['AP50'] == pytest.approx(100.0, abs=1e-4)
            assert res[task]['AP75'] == pytest.approx(0.0, abs=1e-4)


class TestAreaRangeIgnore:
    def test_det_matched_to_ignored_gt_is_ignored(self):
        '''GT_small (area 100) + GT_large (area 10000); one exact detection
        each. In the small range GT_large is ignored, the detection matched
        to it is therefore ignored (neither TP nor FP), and the remaining
        curve is perfect -> APs = 100. Symmetrically APl = 100; all = 100.'''
        small = (0, 0, 10, 10)
        large = (20, 20, 120, 120)
        item = make_item([small, large])
        pred = make_pred([large, small], [0.9, 0.8])
        res = evaluate_predictions([item], [pred], SIGMAS4)
        assert res['bbox']['AP'] == pytest.approx(100.0, abs=1e-4)
        assert res['bbox']['APs'] == pytest.approx(100.0, abs=1e-4)
        assert res['bbox']['APl'] == pytest.approx(100.0, abs=1e-4)
        assert res['segm']['APs'] == pytest.approx(100.0, abs=1e-4)
        assert res['segm']['APl'] == pytest.approx(100.0, abs=1e-4)


class TestKeypointOKS:
    def test_partial_oks_threshold_sweep(self):
        '''Single visible keypoint, sigma 0.25, GT box 40x40 (scale 1600).
        OKS = exp(-d^2 / (2 * scale * (2*sigma)^2)) = exp(-d^2/800).
        Displace the prediction by d^2 = -800*ln(0.72) -> OKS = 0.72
        exactly: TP at thresholds .50/.55/.60/.65/.70, FP above ->
        AP = 5/10*100 = 50.0, AP50 = 100, AP75 = 0.'''
        box = (8, 8, 48, 48)
        gt_kp = np.array([[[28.0, 28.0, 2.0]]])
        d = np.sqrt(-800.0 * np.log(0.72))
        pred_kp = np.array([[[28.0 + d, 28.0, 2.0]]])
        item = make_item([box], kpts=gt_kp)
        pred = make_pred([box], [0.9], kpts=pred_kp, nkp=1)
        res = evaluate_predictions([item], [pred], [0.25])
        assert res['keypoints']['AP'] == pytest.approx(50.0, abs=1e-4)
        assert res['keypoints']['AP50'] == pytest.approx(100.0, abs=1e-4)
        assert res['keypoints']['AP75'] == pytest.approx(0.0, abs=1e-4)

    def test_missed_gt_halves_recall(self):
        '''Image 1: exact keypoint match (TP, score .9). Image 2: far-off
        prediction (OKS ~ 0 -> FP, score .8). recall [.5,.5], precision
        [1,.5] -> envelope [1,.5]; points <= .5 read 1.0, rest 0 ->
        AP = 51/101*100 = 50.49505.'''
        expected = 51 / 101 * 100
        box = (8, 8, 48, 48)
        item1 = make_item([box], gt_kpts_for([box]))
        item2 = make_item([box], gt_kpts_for([box]))
        pred1 = make_pred([box], [0.9])
        far = np.tile([120.0, 120.0, 2.0], (4, 1))[None]
        pred2 = make_pred([box], [0.8], kpts=far)
        res = evaluate_predictions([item1, item2], [pred1, pred2], SIGMAS4)
        assert res['keypoints']['AP'] == pytest.approx(expected, abs=1e-4)
