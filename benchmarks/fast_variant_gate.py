'''AP-parity gate for the fast inference variant (VERDICT r3 item 1).

Evaluates a candidate model dir (e.g. the 192-canvas / 64-proposal fast
variant) against the committed faithful checkpoint on a HELD-OUT
bench-distribution set: same mouse poses (same RNG seed), each rendered
through the real pipeline prep into the model's OWN view geometry, scored
with the COCOeval-semantics evaluator (models/eval.py) + the real-frame
detection rate. The gate passes when the candidate's detection rate is 1.0
and each AP50 is within ``AP_TOL`` (default 2 points) of the faithful model.

Reference workload anchor: /root/reference/moseq2_detectron_extract/model/config.py:30-56
(the reference has exactly one deployed model; the fast variant is a
TPU-extension deployment config gated on matching its quality).

Run on the chip:
  FAST_MODEL=/tmp/fast_model python benchmarks/fast_variant_gate.py
Env: BASE_MODEL (default benchmarks/bench_model), N_EVAL (default 64),
     SEED (default 7000 — disjoint from the training seeds), AP_TOL.
'''
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED = int(os.environ.get('SEED', 7000))
N_EVAL = int(os.environ.get('N_EVAL', 64))
AP_TOL = float(os.environ.get('AP_TOL', 2.0))
# absolute keypoint floor (VERDICT r4 item 3): with the head-bump bench
# mice (bench.draw_mouse) keypoint order is learnable, so BOTH models must
# clear this AP50 — a relative-only gate would pass two equally-broken
# keypoint heads. Set 0 to disable (pre-bump workloads).
KP_AP50_FLOOR = float(os.environ.get('KP_AP50_FLOOR', 90.0))


def eval_model(model_dir):
    '''(detection_rate, mean_top_score, {task: {AP, AP50}}) for one model
    dir on the held-out pose set rendered into ITS view geometry.'''
    from benchmarks.train_bench_model import (detection_rate,
                                              make_bench_view_dataset,
                                              roi_view_params)
    from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
    from moseq2_detectron_extract_tpu.models.eval import evaluate_predictions
    from moseq2_detectron_extract_tpu.models.predictor import (
        Predictor, compute_test_scale)
    from moseq2_detectron_extract_tpu.ops.preprocess import bbox_from_roi

    cfg, params, _ = load_model_dir(model_dir, 'last')

    # the model's own view geometry for the shared ROI/session
    roi, bground, origin, side, _ = roi_view_params()
    scale = compute_test_scale(side, side, cfg.min_size_test,
                               cfg.max_size_test)
    rng = np.random.default_rng(SEED)
    data = make_bench_view_dataset(rng, N_EVAL, cfg, roi, bground, origin,
                                   side, scale)

    items = []
    for i in range(N_EVAL):
        m = data['masks'][i, 0]
        ys, xs = np.where(m)
        items.append({
            'height': m.shape[0], 'width': m.shape[1], 'file_name': '<mem>',
            'annotations': [{
                'bbox': [float(xs.min()), float(ys.min()),
                         float(xs.max() + 1), float(ys.max() + 1)],
                'segmentation': m,
                'keypoints': data['keypoints'][i, 0].ravel().tolist(),
            }],
        })

    predictor = Predictor(cfg, params, batch_size=min(N_EVAL, 32),
                          score_threshold=0.5)
    out = predictor(np.clip(data['image'], 0, 255).astype('uint8'))
    preds = [{k: v[i] for k, v in out.items()} for i in range(N_EVAL)]
    res = evaluate_predictions(items, preds, cfg.oks_sigmas)

    rate, score = detection_rate(cfg, params)
    return rate, score, {t: {'AP': round(res[t]['AP'], 2),
                             'AP50': round(res[t]['AP50'], 2)}
                         for t in ('bbox', 'segm', 'keypoints')}


def main():
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    base_dir = os.environ.get('BASE_MODEL', os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'bench_model'))
    fast_dir = os.environ.get('FAST_MODEL')
    if not fast_dir:
        sys.exit('set FAST_MODEL=<model dir> (e.g. the 192-canvas variant)')

    base_rate, base_score, base_ap = eval_model(base_dir)
    fast_rate, fast_score, fast_ap = eval_model(fast_dir)

    gate = (fast_rate >= 1.0
            and all(fast_ap[t]['AP50'] >= base_ap[t]['AP50'] - AP_TOL
                    for t in ('bbox', 'segm', 'keypoints'))
            and fast_ap['keypoints']['AP50'] >= KP_AP50_FLOOR
            and base_ap['keypoints']['AP50'] >= KP_AP50_FLOOR)
    print(json.dumps({
        'seed': SEED, 'n_eval': N_EVAL, 'ap_tol': AP_TOL,
        'kp_ap50_floor': KP_AP50_FLOOR,
        'base': {'model': base_dir, 'detection_rate': round(base_rate, 4),
                 'mean_top_score': round(base_score, 4), **base_ap},
        'fast': {'model': fast_dir, 'detection_rate': round(fast_rate, 4),
                 'mean_top_score': round(fast_score, 4), **fast_ap},
        'gate_passed': bool(gate),
    }), flush=True)
    if not gate:
        sys.exit(1)


if __name__ == '__main__':
    main()
