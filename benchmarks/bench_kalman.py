'''Kalman smoother backend comparison (regenerates KALMAN_BENCH.md numbers).

Run: JAX_PLATFORMS=cpu python benchmarks/bench_kalman.py

Compares the three interchangeable RTS-smoother backends on the production
tracker dimensions (centroid + angle + 8 keypoints, order-3 constant-jerk:
state 60, observation 20):

* ``numpy``  — vectorized-gain numpy implementation
* ``native`` — C++ core (native/kalman_native.cpp, ctypes)
* ``scan``   — one jitted ``lax.scan`` XLA program, f64 on the CPU backend

All three are validated against each other to <1e-8 by tests/test_proc.py.
'''
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from moseq2_detectron_extract_tpu.proc.kalman import (
    KalmanParams, KalmanTracker, KalmanTrackerAngle, KalmanTrackerNPoints2D,
    KalmanTrackerPoint2D, kalman_em, kalman_smooth, kalman_smooth_scan,
    _scan_available)


def production_params(seed=0):
    items = [KalmanTrackerPoint2D(order=3), KalmanTrackerAngle(order=3),
             KalmanTrackerNPoints2D(8, order=3)]
    tracker = KalmanTracker(items)
    A = tracker._build_trans_mat()
    C = tracker._build_observ_mat()
    rng = np.random.default_rng(seed)
    return KalmanParams(A, C, np.eye(A.shape[0]) * 0.1, np.eye(C.shape[0]) * 0.5,
                        rng.normal(size=A.shape[0]), np.eye(A.shape[0]))


def timeit(fn, min_s=3.0):
    fn()   # warmup (jit compile for the scan backend)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < min_s:
        fn()
        n += 1
    return (time.perf_counter() - t0) / n


def main():
    params = production_params()
    rng = np.random.default_rng(1)
    out = {}
    for T in (500, 1000, 3000):
        obs = rng.normal(size=(T, params.observation.shape[0]))
        miss = rng.random(T) < 0.1
        row = {
            'numpy_ms': timeit(lambda: kalman_smooth(
                params, obs, miss, backend='numpy')) * 1000,
            'native_ms': timeit(lambda: kalman_smooth(
                params, obs, miss, backend='native')) * 1000,
        }
        if _scan_available():
            row['scan_ms'] = timeit(lambda: kalman_smooth_scan(
                params, obs, miss)) * 1000
        # the steady fast path only applies with nothing missing (the EM /
        # every-frame-detected regime); time it on an all-observed series
        row['steady_nomiss_ms'] = timeit(lambda: kalman_smooth(
            params, obs, np.zeros(T, bool), backend='steady')) * 1000
        out[f'T={T}'] = {k: round(v, 1) for k, v in row.items()}

    # EM as the pipeline runs it: 10 iterations on the init chunk
    obs = rng.normal(size=(500, params.observation.shape[0]))
    miss = np.zeros(500, bool)
    out['em_10iter_T500_s'] = round(
        timeit(lambda: kalman_em(params, obs, miss, n_iter=10), min_s=5.0), 2)
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
