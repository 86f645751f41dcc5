'''Run C of the proposal-budget A/B: the per-level pre-NMS clamp.

With a global NMS cap, a candidate outside its level's top-``cap`` can only
matter if higher-scored same-level candidates decode to EMPTY boxes
(models/rpn.py:select_proposals). This script verifies bit-identity of the
clamped fast path (CLAMP_LEVEL_K=True, the shipping default) against the
unclamped baseline on real bench-distribution frames through the full
Predictor, for the deployed faithful (128/512) and fast-variant (64/256)
budgets, and measures the device round-trip saving.

Run on the chip: python benchmarks/level_k_clamp_ab.py
'''
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax

    from benchmarks.proposal_topk_ab import _bench_frames
    from moseq2_detectron_extract_tpu.models import rpn
    from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
    from moseq2_detectron_extract_tpu.models.predictor import Predictor

    here = os.path.dirname(os.path.abspath(__file__))
    frames = _bench_frames(64)
    results = {}
    for name, model_dir in (('faithful_128_512', os.path.join(here, 'bench_model')),
                            ('fast_64_256', os.path.join(here, 'bench_model_fast'))):
        cfg, params, _ = load_model_dir(model_dir, 'last')
        outs, fps = {}, {}
        for clamp in (False, True):
            rpn.CLAMP_LEVEL_K = clamp
            pred = Predictor(cfg, params, batch_size=64, score_threshold=0.5)
            out = pred(frames)
            outs[clamp] = {k: np.asarray(v) for k, v in out.items()}
            dev = jax.device_put(frames)
            jax.block_until_ready(pred(dev, return_device=True))
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                jax.block_until_ready(pred(dev, return_device=True))
            fps[clamp] = round(reps * len(frames) / (time.perf_counter() - t0), 1)
        rpn.CLAMP_LEVEL_K = True
        row = {
            'max_box_delta_px': float(np.abs(
                outs[True]['boxes'] - outs[False]['boxes']).max()),
            'max_kpt_delta_px': float(np.abs(
                outs[True]['keypoints'][..., :2]
                - outs[False]['keypoints'][..., :2]).max()),
            'valid_equal': bool((outs[True]['valid']
                                 == outs[False]['valid']).all()),
            'device_fps_unclamped': fps[False],
            'device_fps_clamped': fps[True],
        }
        results[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps({'results': results}), flush=True)


if __name__ == '__main__':
    main()
