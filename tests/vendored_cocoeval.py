'''Vendored pycocotools COCOeval core (pure numpy, single category).

A faithful structural port of the upstream ``pycocotools/cocoeval.py``
algorithm — evaluateImg's T-threshold greedy matcher operating on id
matrices, accumulate()'s (T, R, A, M) precision tensor, summarize()'s
lookups — with the C ``_mask`` extension replaced by numpy equivalents
(binary-array mask IoU, xywh box IoU, computeOks formula). Used ONLY as an
independent cross-check oracle for
``moseq2_detectron_extract_tpu/models/eval.py`` (which reorganizes the
computation rather than porting it); the two implementations share no code
paths, so agreement on randomized scenarios is real evidence
(VERDICT round-3 item 7; reference delegation: m2de/model/eval.py:23-162).

Input format (per image):
  gt:  [{'bbox': [x, y, w, h], 'area': float, 'ignore': 0/1,
         'segmentation': bool (H, W) array or None,
         'keypoints': flat [x1, y1, v1, ...] or None}]
  dt:  [{'bbox': [x, y, w, h], 'score': float,
         'segmentation': ..., 'keypoints': ..., 'area': float}]
'''
from typing import Dict, List, Optional, Sequence

import numpy as np


class Params:
    '''pycocotools Params (single category).'''

    def __init__(self, iouType: str = 'bbox'):
        self.iouThrs = np.linspace(.5, 0.95,
                                   int(np.round((0.95 - .5) / .05)) + 1,
                                   endpoint=True)
        self.recThrs = np.linspace(.0, 1.00,
                                   int(np.round((1.00 - .0) / .01)) + 1,
                                   endpoint=True)
        if iouType == 'keypoints':
            self.maxDets = [20]
            self.areaRng = [[0 ** 2, 1e5 ** 2], [32 ** 2, 96 ** 2],
                            [96 ** 2, 1e5 ** 2]]
            self.areaRngLbl = ['all', 'medium', 'large']
        else:
            self.maxDets = [1, 10, 100]
            self.areaRng = [[0 ** 2, 1e5 ** 2], [0 ** 2, 32 ** 2],
                            [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2]]
            self.areaRngLbl = ['all', 'small', 'medium', 'large']
        self.iouType = iouType
        self.kpt_oks_sigmas = None  # set by caller for keypoints


def _bbox_iou_xywh(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    '''maskUtils.iou on xywh boxes, iscrowd all false -> IoU (D, G).'''
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    d_xy = np.stack([dt[:, 0], dt[:, 1], dt[:, 0] + dt[:, 2],
                     dt[:, 1] + dt[:, 3]], axis=1)
    g_xy = np.stack([gt[:, 0], gt[:, 1], gt[:, 0] + gt[:, 2],
                     gt[:, 1] + gt[:, 3]], axis=1)
    lt = np.maximum(d_xy[:, None, :2], g_xy[None, :, :2])
    rb = np.minimum(d_xy[:, None, 2:], g_xy[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = dt[:, 2] * dt[:, 3]
    area_g = gt[:, 2] * gt[:, 3]
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, np.spacing(1)), 0.0)


def _mask_iou(dt_masks: Sequence[np.ndarray],
              gt_masks: Sequence[np.ndarray]) -> np.ndarray:
    out = np.zeros((len(dt_masks), len(gt_masks)))
    for i, dm in enumerate(dt_masks):
        for j, gm in enumerate(gt_masks):
            inter = float(np.logical_and(dm, gm).sum())
            union = float(np.logical_or(dm, gm).sum())
            out[i, j] = inter / union if union > 0 else 0.0
    return out


class COCOevalLite:
    '''Single-category COCOeval over pre-grouped per-image gt/dt lists.'''

    def __init__(self, gts: List[List[Dict]], dts: List[List[Dict]],
                 iouType: str = 'bbox',
                 kpt_oks_sigmas: Optional[Sequence[float]] = None):
        assert len(gts) == len(dts)
        self.params = Params(iouType)
        if kpt_oks_sigmas is not None:
            self.params.kpt_oks_sigmas = np.asarray(kpt_oks_sigmas, float)
        self.gts = gts
        self.dts = dts
        self.eval: Dict = {}

    # -- computeIoU / computeOks (cocoeval.py semantics) --------------------
    def computeIoU(self, imgId: int) -> np.ndarray:
        p = self.params
        gt = self.gts[imgId]
        dt = sorted(self.dts[imgId], key=lambda d: -d['score'])
        if len(dt) > p.maxDets[-1]:
            dt = dt[0:p.maxDets[-1]]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        if p.iouType == 'segm':
            return _mask_iou([d['segmentation'] for d in dt],
                             [g['segmentation'] for g in gt])
        return _bbox_iou_xywh(np.asarray([d['bbox'] for d in dt], float),
                              np.asarray([g['bbox'] for g in gt], float))

    def computeOks(self, imgId: int) -> np.ndarray:
        p = self.params
        gts = self.gts[imgId]
        dts = sorted(self.dts[imgId], key=lambda d: -d['score'])
        if len(dts) > p.maxDets[-1]:
            dts = dts[0:p.maxDets[-1]]
        if len(gts) == 0 or len(dts) == 0:
            return np.zeros((len(dts), len(gts)))
        sigmas = p.kpt_oks_sigmas
        vars_ = (sigmas * 2) ** 2
        k = len(sigmas)
        ious = np.zeros((len(dts), len(gts)))
        for j, gt in enumerate(gts):
            g = np.array(gt['keypoints'])
            xg = g[0::3]; yg = g[1::3]; vg = g[2::3]  # noqa: E702
            k1 = np.count_nonzero(vg > 0)
            bb = gt['bbox']
            x0 = bb[0] - bb[2]; x1 = bb[0] + bb[2] * 2  # noqa: E702
            y0 = bb[1] - bb[3]; y1 = bb[1] + bb[3] * 2  # noqa: E702
            for i, dt in enumerate(dts):
                d = np.array(dt['keypoints'])
                xd = d[0::3]; yd = d[1::3]  # noqa: E702
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    z = np.zeros(k)
                    dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
                e = (dx ** 2 + dy ** 2) / vars_ / \
                    (gt['area'] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    # -- evaluateImg --------------------------------------------------------
    def evaluateImg(self, imgId: int, aRng, maxDet: int, ious_full: np.ndarray):
        gt = self.gts[imgId]
        dt = self.dts[imgId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        p = self.params
        for g in gt:
            if g.get('ignore', 0) or (g['area'] < aRng[0] or g['area'] > aRng[1]):
                g['_ignore'] = 1
            else:
                g['_ignore'] = 0
        gtind = np.argsort([g['_ignore'] for g in gt], kind='mergesort')
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d['score'] for d in dt], kind='mergesort')
        dt = [dt[i] for i in dtind[0:maxDet]]
        # rows of ious_full follow score order (computeIoU sorted); columns
        # follow original gt order
        ious = ious_full[:len(dt), gtind] if len(ious_full) > 0 else ious_full

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g['_ignore'] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious) != 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = 1 + m       # 1-based gt id stand-in
                    gtm[tind, m] = 1 + dind
        a = np.array([d['area'] < aRng[0] or d['area'] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            'dtMatches': dtm,
            'dtScores': [d['score'] for d in dt],
            'gtIgnore': gtIg,
            'dtIgnore': dtIg,
        }

    # -- accumulate + summarize ---------------------------------------------
    def evaluate_and_accumulate(self):
        p = self.params
        n_img = len(self.gts)
        if p.iouType == 'keypoints':
            # upstream _prepare: gt['ignore'] |= (gt['num_keypoints'] == 0)
            for gts in self.gts:
                for g in gts:
                    vis = np.array(g['keypoints'])[2::3]
                    g['ignore'] = int(g.get('ignore', 0) or
                                      np.count_nonzero(vis > 0) == 0)
        compute = self.computeOks if p.iouType == 'keypoints' else self.computeIoU
        self.ious = {i: compute(i) for i in range(n_img)}
        T = len(p.iouThrs)
        R = len(p.recThrs)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, A, M))
        recall = -np.ones((T, A, M))
        for aind, aRng in enumerate(p.areaRng):
            for mind, maxDet in enumerate(p.maxDets):
                E = [self.evaluateImg(i, aRng, maxDet, self.ious[i])
                     for i in range(n_img)]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dtScores = np.concatenate(
                    [e['dtScores'][0:maxDet] for e in E])
                inds = np.argsort(-dtScores, kind='mergesort')
                dtm = np.concatenate(
                    [e['dtMatches'][:, 0:maxDet] for e in E], axis=1)[:, inds]
                dtIg = np.concatenate(
                    [e['dtIgnore'][:, 0:maxDet] for e in E], axis=1)[:, inds]
                gtIg = np.concatenate([e['gtIgnore'] for e in E])
                npig = np.count_nonzero(gtIg == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dtIg))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dtIg))
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    tp = np.array(tp)
                    fp = np.array(fp)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, aind, mind] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, p.recThrs, side='left')
                    try:
                        for ri, pi in enumerate(inds_r):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, aind, mind] = np.array(q)
        self.eval = {'precision': precision, 'recall': recall}
        return self

    def summarize(self) -> Dict[str, float]:
        '''AP / AP50 / AP75 / area-range APs as percentages, -1 when empty
        (pycocotools _summarize semantics).'''
        p = self.params

        def _ap(iouThr=None, areaRng='all', maxDets=None):
            if maxDets is None:
                maxDets = p.maxDets[-1]
            aind = [i for i, lbl in enumerate(p.areaRngLbl) if lbl == areaRng]
            mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
            s = self.eval['precision']
            if iouThr is not None:
                t = np.where(np.abs(iouThr - p.iouThrs) < 1e-9)[0]
                s = s[t]
            s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                return -1.0
            return float(np.mean(s[s > -1]))

        out = {
            'AP': _ap() * 100 if _ap() != -1 else -1.0,
            'AP50': _ap(iouThr=0.5) * 100 if _ap(iouThr=0.5) != -1 else -1.0,
            'AP75': _ap(iouThr=0.75) * 100 if _ap(iouThr=0.75) != -1 else -1.0,
        }
        for lbl in p.areaRngLbl:
            if lbl == 'all':
                continue
            v = _ap(areaRng=lbl)
            out['AP' + lbl[0]] = v * 100 if v != -1 else -1.0
        return out
