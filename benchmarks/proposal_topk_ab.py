'''A/B the RPN post-NMS proposal budget at inference.

The box stage (Pallas ROIAlign over B*topk ROIs + box head) and the
proposal-NMS fixpoint are the two largest device costs after the backbone
(benchmarks/DEVICE_ATTRIB.md: 13.6 ms + 6.3 ms of a 39.9 ms batch-64
program). Both scale with the proposal budget. The reference runs 1000
post-NMS proposals (detectron2 default, /root/reference/moseq2_detectron_extract/
model/config.py:30-35); this rebuild ships 256 (models/config.py:47, an
explicitly documented TPU deviation). This script measures what a smaller
budget costs in DETECTION terms on the bench distribution — rate, score,
box/keypoint agreement vs the 256 shipping setting — and what it buys in
device throughput, so any further change is evidence-backed.

Run on the chip: python benchmarks/proposal_topk_ab.py
'''
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench_frames(nframes=64):
    '''Real bench-distribution frames through the real host prep.'''
    import tempfile
    from functools import partial

    import jax.numpy as jnp

    import bench
    from moseq2_detectron_extract_tpu.io.session import Session, Stream
    from moseq2_detectron_extract_tpu.ops.preprocess import (
        decode_prepped_frames, prep_raw_frames_host, scale_raw_frames)

    work = tempfile.mkdtemp(prefix='topk_ab_')
    path = bench.write_session(os.path.join(work, 's'), nframes, seed=3)
    sess = Session(path)
    sess._bground_im = bench.make_background()
    sess.find_roi(bg_roi_depth_range=(650, 750), cache_dir=None)
    it = sess.iterate(chunk_size=nframes, streams=(Stream.DEPTH,))
    it.attach_filter(Stream.DEPTH, partial(
        prep_raw_frames_host, bground_im=sess.bground_im, roi=sess.roi,
        vmin=0, vmax=100, dtype='uint8'))
    _, chunk = next(iter(it))
    return np.asarray(scale_raw_frames(
        decode_prepped_frames(jnp.asarray(np.asarray(chunk))), 0, 100))


def main():
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax

    from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
    from moseq2_detectron_extract_tpu.models.predictor import Predictor

    model_dir = os.environ.get(
        'BENCH_MODEL',
        os.path.join(os.path.dirname(os.path.abspath(__file__)), 'bench_model'))
    cfg, params, _ = load_model_dir(model_dir, 'last')
    frames = _bench_frames(64)

    results = {}
    ref_boxes = ref_kpts = None
    import ast
    spec = os.environ.get('TOPK_VARIANTS')
    if spec:
        variants = [dict(zip(('rpn_post_nms_topk_test', 'rpn_nms_global_cap'),
                             v if isinstance(v, tuple) else (v,)))
                    for v in ast.literal_eval(spec)]
    else:
        variants = [dict(rpn_post_nms_topk_test=256),
                    dict(rpn_post_nms_topk_test=128),
                    dict(rpn_post_nms_topk_test=64),
                    dict(rpn_post_nms_topk_test=128, rpn_nms_global_cap=512),
                    dict(rpn_post_nms_topk_test=128, rpn_nms_global_cap=256)]
    for variant in variants:
        topk = '_'.join(str(v) for v in variant.values())
        pred = Predictor(cfg.replace(**variant), params,
                         batch_size=64, score_threshold=0.5)
        out = pred(frames)               # compile + quality pass
        valid = np.asarray(out['valid'])
        boxes = np.asarray(out['boxes'])[:, 0]      # top detection
        kpts = np.asarray(out['keypoints'])[:, 0, :, :2]
        row = {
            'det_rate': float(valid.any(axis=1).mean()),
            'mean_top_score': float(np.asarray(out['scores'])[:, 0].mean()),
        }
        if ref_boxes is None:
            ref_boxes, ref_kpts = boxes, kpts
        else:
            row['max_box_delta_px'] = float(np.abs(boxes - ref_boxes).max())
            row['max_kpt_delta_px'] = float(np.abs(kpts - ref_kpts).max())

        # RTT-immune slope measurement of the pipeline's device program
        # (predictor step + fused select), same method as bench.py extras
        import bench as _bench
        row['device_fps'] = round(_bench.measure_device_slope_fps(
            pred, frames.shape[1:]), 1)
        results[f'topk_{topk}'] = row
        print(json.dumps({f'topk_{topk}': row}), flush=True)

    print(json.dumps({'model': model_dir, 'results': results}), flush=True)


if __name__ == '__main__':
    main()
