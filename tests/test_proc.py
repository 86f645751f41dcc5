'''Tests of the feature-processing layer vs numpy oracles.'''
import numpy as np
import pytest

from moseq2_detectron_extract_tpu.proc.angles import (angle_difference, clamp_angles_deg,
                                                      filter_angles,
                                                      iterative_filter_angles)
from moseq2_detectron_extract_tpu.proc.features import (clean_frames,
                                                        compute_keypoint_alignment_scores,
                                                        flips_from_keypoints,
                                                        get_frame_features,
                                                        instances_to_features)
from moseq2_detectron_extract_tpu.proc.kalman import (KalmanParams, KalmanTracker,
                                                      KalmanTrackerAngle,
                                                      KalmanTrackerNPoints2D,
                                                      KalmanTrackerPoint2D, kalman_em,
                                                      kalman_filter, kalman_smooth)
from moseq2_detectron_extract_tpu.proc.keypoints import (keypoints_to_dict,
                                                         rotate_points,
                                                         rotate_points_batch)
from moseq2_detectron_extract_tpu.proc.scalars import compute_scalars

import jax.numpy as jnp


def np_move_median3(a):
    out = np.empty_like(a, dtype=float)
    for i in range(len(a)):
        out[i] = np.median(a[max(0, i - 2):i + 1])
    return out


class TestAngles:
    def test_clamp(self):
        np.testing.assert_allclose(np.asarray(clamp_angles_deg(np.array([-10.0, 370.0, 350.0]))),
                                   [350.0, 10.0, 350.0])

    def test_angle_difference(self):
        d = np.asarray(angle_difference(np.array([350.0, 10.0]), np.array([10.0, 350.0])))
        np.testing.assert_allclose(d, [20.0, -20.0])

    def test_filter_angles_oracle(self, rng):
        angles = rng.uniform(0, 360, size=50).astype('float32')
        # reference oracle (m2de/proc/proc.py:600-624) with trailing median
        windows = np_move_median3(angles)
        diff = angles - windows
        absdiff = np.abs(diff)
        fl = (absdiff > 120) & (absdiff < 240)
        expect = angles.copy()
        expect[fl] = expect[fl] - 180 * np.sign(diff[fl])
        ours = np.asarray(filter_angles(angles, window=3, tolerance=60))
        np.testing.assert_allclose(ours, expect, atol=1e-4)

    def test_iterative_filter_fixes_isolated_flip(self):
        angles = np.full(20, 30.0, dtype='float32')
        angles[7] = 212.0  # ~180 off
        out, flips = iterative_filter_angles(angles)
        out = np.asarray(out)
        assert abs(out[7] - 32.0) < 1e-3
        assert np.asarray(flips)[7]


class TestKalman:
    def _params_1d(self):
        A = np.array([[1.0, 1.0], [0.0, 1.0]])
        C = np.array([[1.0, 0.0]])
        return KalmanParams(
            transition=jnp.asarray(A, jnp.float32),
            observation=jnp.asarray(C, jnp.float32),
            transition_cov=jnp.eye(2, dtype=jnp.float32) * 0.01,
            observation_cov=jnp.eye(1, dtype=jnp.float32) * 1.0,
            initial_mean=jnp.zeros(2, jnp.float32),
            initial_cov=jnp.eye(2, dtype=jnp.float32),
        )

    def test_filter_tracks_line(self, rng):
        params = self._params_1d()
        t = np.arange(100, dtype='float32')
        obs = (2.0 * t + rng.normal(0, 1.0, 100)).astype('float32')[:, None]
        missing = np.zeros(100, bool)
        filt = kalman_filter(params, jnp.asarray(obs), jnp.asarray(missing))
        means = np.asarray(filt['means'])
        # latter half should track the line closely
        assert np.abs(means[50:, 0] - obs[50:, 0]).mean() < 1.5

    def test_smoother_beats_filter(self, rng):
        params = self._params_1d()
        t = np.arange(200, dtype='float32')
        truth = 0.5 * t
        obs = (truth + rng.normal(0, 2.0, 200)).astype('float32')[:, None]
        missing = np.zeros(200, bool)
        filt = kalman_filter(params, jnp.asarray(obs), jnp.asarray(missing))
        sm = kalman_smooth(params, jnp.asarray(obs), jnp.asarray(missing))
        err_f = np.abs(np.asarray(filt['means'])[20:, 0] - truth[20:]).mean()
        err_s = np.abs(np.asarray(sm['means'])[20:, 0] - truth[20:]).mean()
        assert err_s < err_f

    def test_missing_observations_skipped(self, rng):
        params = self._params_1d()
        obs = np.linspace(0, 50, 51, dtype='float32')[:, None]
        missing = np.zeros(51, bool)
        missing[20:30] = True
        sm = kalman_smooth(params, jnp.asarray(obs), jnp.asarray(missing))
        means = np.asarray(sm['means'])
        # smoothed trajectory should interpolate through the gap
        assert np.abs(means[25, 0] - 25.0) < 3.0

    def test_em_improves_likelihood_proxy(self, rng):
        params = self._params_1d()
        t = np.arange(150, dtype='float32')
        obs = (3.0 * t + rng.normal(0, 0.5, 150)).astype('float32')[:, None]
        missing = jnp.zeros(150, bool)
        fitted = kalman_em(params, jnp.asarray(obs), missing, n_iter=5)
        # observation noise ~0.25 variance; EM should pull obs_cov toward it
        assert float(fitted.observation_cov[0, 0]) < 1.0

    def test_tracker_round_trip(self, rng):
        tracker = KalmanTracker([KalmanTrackerPoint2D(order=3),
                                 KalmanTrackerNPoints2D(3, order=3)])
        t = np.arange(60)
        centroid = np.stack([t * 1.0, t * 0.5], axis=1) + rng.normal(0, 0.1, (60, 2))
        kpts = centroid[:, None, :] + rng.normal(0, 0.2, (60, 3, 2))
        tracker.initialize([centroid, kpts])
        assert tracker.is_initialized
        s_centroid, s_kpts = tracker.smooth_update([centroid, kpts])
        assert s_centroid.shape == (60, 2)
        assert s_kpts.shape == (60, 3, 2)
        assert np.abs(s_centroid[30:] - centroid[30:]).mean() < 1.0
        # streaming update + sample
        out, = tracker.sample(1) if False else (tracker.sample(1)[0],)
        upd_c, upd_k = tracker.filter_update([centroid[-1:] + 1.0, kpts[-1:] + 1.0])
        assert upd_c.shape == (1, 2)

    def test_angle_tracker(self):
        tracker = KalmanTracker([KalmanTrackerAngle(order=3, degrees=True)])
        angles = np.linspace(0, 90, 50)
        tracker.initialize([angles])
        smoothed, = tracker.smooth_update([angles])
        assert smoothed.shape == (50,)
        # smoothed trend should be monotone-ish increasing
        assert smoothed[-1] > smoothed[10]
        pred, = tracker.sample(1)
        assert 0 <= pred[0] < 360


class TestFlips:
    def _mouse_keypoints(self, n, facing_east=True):
        # nose/ears/neck at +x; hips/tailbase at -x (east-facing, angle 0)
        base = np.array([[30, 0], [25, 5], [25, -5], [20, 0],
                         [-10, 5], [-10, -5], [-20, 0], [-35, 0]], dtype=float)
        if not facing_east:
            base = base * np.array([-1, 1])
        kpts = np.tile(base[None], (n, 1, 1)) + 50.0
        scores = np.ones((n, 8, 1))
        return np.concatenate([kpts, scores], axis=2)

    def test_no_flip_when_aligned(self):
        kpts = self._mouse_keypoints(5, facing_east=True)
        centroids = np.full((5, 2), 50.0)
        angles = np.zeros(5)
        flips, conf = flips_from_keypoints(kpts, centroids, angles, length=80)
        assert not flips.any()
        assert (conf > 0.9).all()

    def test_flip_when_reversed(self):
        kpts = self._mouse_keypoints(5, facing_east=False)
        centroids = np.full((5, 2), 50.0)
        angles = np.zeros(5)
        flips, conf = flips_from_keypoints(kpts, centroids, angles, length=80)
        assert flips.all()

    def test_alignment_scores(self):
        kpts = self._mouse_keypoints(3, facing_east=True)[:, :7, :2]
        scores = compute_keypoint_alignment_scores(kpts - 50.0)
        assert (scores > 0.9).all()
        scores_flipped = compute_keypoint_alignment_scores((kpts - 50.0) * np.array([-1, 1]))
        assert (scores_flipped < 0.2).all()


class TestRotatePoints:
    def test_single_matches_batch(self, rng):
        pts = rng.uniform(0, 100, (6, 3))
        center = (40.0, 30.0)
        out1 = rotate_points(pts.copy(), center, 35.0)
        out2 = rotate_points_batch(pts[None].copy(), np.array([center]), 35.0)[0]
        np.testing.assert_allclose(out1, out2, atol=1e-8)

    def test_rotation_90(self):
        pts = np.array([[1.0, 0.0]])
        out = rotate_points(pts, (0, 0), 90.0)
        # reference rotates by -angle internally: (1,0) -> (0,-1)
        # (and squeezes single points to shape (2,), like the reference)
        np.testing.assert_allclose(np.ravel(out), [0.0, -1.0], atol=1e-12)


class TestScalars:
    def test_shapes_and_basic_values(self, rng):
        n, h, w = 10, 40, 50
        frames = np.zeros((n, h, w), dtype='uint8')
        frames[:, 10:20, 15:30] = 50  # a 10x15 block of height 50mm
        track = {
            'centroid': np.tile(np.array([[22.0, 15.0]]), (n, 1)),
            'orientation': np.full(n, 45.0),
            'axis_length': np.tile(np.array([[20.0, 8.0]]), (n, 1)),
        }
        scalars = compute_scalars(frames, track, min_height=10, max_height=100,
                                  true_depth=673.1)
        assert set(scalars.keys()) == {
            'centroid_x_px', 'centroid_y_px', 'velocity_2d_px', 'velocity_3d_px',
            'width_px', 'length_px', 'area_px', 'centroid_x_mm', 'centroid_y_mm',
            'velocity_2d_mm', 'velocity_3d_mm', 'width_mm', 'length_mm', 'area_mm',
            'height_ave_mm', 'angle', 'velocity_theta'}
        np.testing.assert_allclose(scalars['area_px'], 150)
        np.testing.assert_allclose(scalars['height_ave_mm'], 50.0)
        np.testing.assert_allclose(scalars['width_px'], 8.0)
        np.testing.assert_allclose(scalars['length_px'], 20.0)
        np.testing.assert_allclose(scalars['angle'], np.deg2rad(45.0), rtol=1e-6)
        np.testing.assert_allclose(scalars['velocity_2d_px'], 0.0, atol=1e-6)


class TestKeypointsToDict:
    def test_reference_and_rotated(self):
        n = 4
        kpts = np.zeros((n, 8, 3))
        kpts[:, :, 0] = np.arange(8)[None] * 5 + 10  # x
        kpts[:, :, 1] = 20.0
        kpts[:, :, 2] = 0.9
        frames = np.full((n, 64, 64), 42, dtype='uint8')
        centers = np.full((n, 2), 30.0)
        angles = np.zeros(n)
        out = keypoints_to_dict(kpts, frames, centers, angles, true_depth=673.1)
        assert out['reference/Nose_x_px'].shape == (n,)
        np.testing.assert_allclose(out['reference/Nose_x_px'], 10.0)
        np.testing.assert_allclose(out['reference/Nose_z_mm'], 42.0)
        np.testing.assert_allclose(out['rotated/Nose_x_px'], -20.0)  # 10 - 30
        np.testing.assert_allclose(out['reference/Nose_score'], 0.9)


class TestInstancesToFeatures:
    def _synthetic_chunk(self, n=12):
        h, w = 128, 160
        raw = np.zeros((n, h, w), dtype='uint8')
        masks = np.zeros((n, h, w), dtype='uint8')
        kpts = np.zeros((n, 8, 3))
        import cv2
        for i in range(n):
            cx, cy = 60 + i, 55
            cv2.ellipse(raw[i], (cx, cy), (34, 17), 0, 0, 360, 40, -1)
            cv2.ellipse(masks[i], (cx, cy), (36, 19), 0, 0, 360, 1, -1)
            base = np.array([[30, 0], [24, 7], [24, -7], [18, 0],
                             [-12, 7], [-12, -7], [-20, 0], [-32, 0]], dtype=float)
            kpts[i, :, 0] = base[:, 0] + cx
            kpts[i, :, 1] = base[:, 1] + cy
            kpts[i, :, 2] = 0.95
        return raw, masks, kpts

    def test_non_tracking_path(self):
        raw, masks, kpts = self._synthetic_chunk()
        out = instances_to_features(masks, kpts, np.ones(len(raw)), raw,
                                    None, None, debug=False)
        assert out['cleaned_frames'].shape == raw.shape
        assert out['features']['centroid'].shape == (len(raw), 2)
        cents = out['features']['centroid']
        assert np.abs(cents[:, 1] - 55).max() < 3
        # east-facing mouse: angle should be near 0 or 360
        ang = out['features']['orientation'] % 360
        assert ((ang < 30) | (ang > 330)).all()

    def test_tracking_path(self):
        raw, masks, kpts = self._synthetic_chunk()
        point_tracker = KalmanTracker([KalmanTrackerPoint2D(order=3),
                                       KalmanTrackerNPoints2D(8, order=3)])
        angle_tracker = KalmanTracker([KalmanTrackerAngle(order=3, degrees=True)])
        out = instances_to_features(masks, kpts, np.ones(len(raw)), raw,
                                    point_tracker, angle_tracker, debug=False)
        assert point_tracker.is_initialized and angle_tracker.is_initialized
        assert out['features']['orientation'].shape == (len(raw),)
        assert np.isfinite(out['features']['centroid']).all()


class TestAngleInterventionScan:
    '''The jitted lax.scan angle-intervention path must exactly reproduce the
    per-frame Python loop (kept as the debug path) — including tracker state
    carried across chunks (m2de/proc/proc.py:769-818).'''

    def _chunk(self, n=60, seed=3):
        rng = np.random.default_rng(seed)
        h, w = 128, 160
        raw = np.zeros((n, h, w), dtype='uint8')
        masks = np.zeros((n, h, w), dtype='uint8')
        kpts = np.zeros((n, 8, 3))
        import cv2
        for i in range(n):
            cx, cy = 60 + i % 30, 55
            ang = (i * 7) % 360
            cv2.ellipse(raw[i], (cx, cy), (34, 17), ang, 0, 360, 40, -1)
            cv2.ellipse(masks[i], (cx, cy), (36, 19), ang, 0, 360, 1, -1)
            base = np.array([[30, 0], [24, 7], [24, -7], [18, 0],
                             [-12, 7], [-12, -7], [-20, 0], [-32, 0]],
                            dtype=float)
            if i % 11 == 0:
                base = -base              # flipped keypoints -> big deviation
            if i % 7 == 0:
                rng.shuffle(base)         # scrambled -> low alignment score
            rad = np.deg2rad(ang)
            rot = np.array([[np.cos(rad), -np.sin(rad)],
                            [np.sin(rad), np.cos(rad)]])
            kpts[i, :, :2] = base @ rot.T + [cx, cy]
            kpts[i, :, 2] = 0.95
        return raw, masks, kpts

    def _trackers(self):
        point = KalmanTracker([KalmanTrackerPoint2D(order=3),
                               KalmanTrackerNPoints2D(8, order=3)])
        angle = KalmanTracker([KalmanTrackerAngle(order=3, degrees=True)])
        return point, angle

    def test_scan_matches_python_loop(self, tmp_path):
        raw, masks, kpts = self._chunk()
        ones = np.ones(len(raw))

        pt_a, ang_a = self._trackers()
        out_scan = instances_to_features(masks, kpts.copy(), ones, raw,
                                         pt_a, ang_a, debug=False)
        pt_b, ang_b = self._trackers()
        out_loop = instances_to_features(masks, kpts.copy(), ones, raw,
                                         pt_b, ang_b, debug=True,
                                         debug_dir=str(tmp_path))

        np.testing.assert_allclose(out_scan['features']['orientation'],
                                   out_loop['features']['orientation'],
                                   rtol=0, atol=1e-8)
        np.testing.assert_array_equal(out_scan['flips'], out_loop['flips'])
        np.testing.assert_allclose(ang_a.last_mean, ang_b.last_mean, atol=1e-9)
        np.testing.assert_allclose(ang_a.last_covar, ang_b.last_covar,
                                   atol=1e-9)
        # interventions actually fired in this synthetic chunk
        dbg = (tmp_path / 'flip_info.tsv').read_text().splitlines()
        assert any('flip 180' in l or 'defer to sample' in l for l in dbg)

    def test_scan_carries_state_across_chunks(self, tmp_path):
        raw, masks, kpts = self._chunk(n=40)
        ones = np.ones(20)

        pt_a, ang_a = self._trackers()
        o1 = instances_to_features(masks[:20], kpts[:20].copy(), ones,
                                   raw[:20], pt_a, ang_a, debug=False)
        o2 = instances_to_features(masks[20:], kpts[20:].copy(), ones,
                                   raw[20:], pt_a, ang_a, debug=False)
        pt_b, ang_b = self._trackers()
        l1 = instances_to_features(masks[:20], kpts[:20].copy(), ones,
                                   raw[:20], pt_b, ang_b, debug=True,
                                   debug_dir=str(tmp_path))
        l2 = instances_to_features(masks[20:], kpts[20:].copy(), ones,
                                   raw[20:], pt_b, ang_b, debug=True,
                                   debug_dir=str(tmp_path))
        np.testing.assert_allclose(
            np.concatenate([o1['features']['orientation'],
                            o2['features']['orientation']]),
            np.concatenate([l1['features']['orientation'],
                            l2['features']['orientation']]), atol=1e-8)

    def test_nan_frames_defer_to_prediction_path(self):
        raw, masks, kpts = self._chunk(n=30)
        kpts[10:13] = np.nan
        masks[10:13] = 0
        pt, ang = self._trackers()
        out = instances_to_features(masks, kpts, np.ones(30), raw,
                                    pt, ang, debug=False)
        assert out['features']['orientation'].shape == (30,)
        assert np.isfinite(ang.last_mean).all()


class TestNativeKalman:
    def test_native_matches_numpy(self, rng):
        from moseq2_detectron_extract_tpu.native import load_kalman_lib
        import pytest as _pytest
        if load_kalman_lib() is None:
            _pytest.skip('no native toolchain')
        from moseq2_detectron_extract_tpu.proc import kalman as K
        S, O, T = 12, 4, 200
        A = np.eye(S) + np.diag(np.ones(S - 1) * 0.1, 1)
        C = np.zeros((O, S))
        C[np.arange(O), np.arange(O) * 3] = 1
        params = K.KalmanParams(A, C, np.eye(S) * 0.01, np.eye(O), np.zeros(S),
                                np.eye(S))
        obs = rng.normal(0, 1, (T, O))
        missing = np.zeros(T, bool)
        missing[50:60] = True
        f_np = K.kalman_filter(params, obs, missing, use_native=False)
        f_c = K.kalman_filter(params, obs, missing, use_native=True)
        for k in ('means', 'covs', 'pred_means', 'pred_covs'):
            np.testing.assert_allclose(f_np[k], f_c[k], atol=1e-9)
        s_np = K.kalman_smooth(params, obs, missing, backend='numpy')
        s_c = K.kalman_smooth(params, obs, missing, backend='native')
        for k in ('means', 'covs', 'lag_one_covs'):
            np.testing.assert_allclose(s_np[k], s_c[k], atol=1e-9)

    def test_scan_backend_matches_numpy(self, rng):
        '''The jitted lax.scan RTS smoother (f64 CPU) must agree with the
        reference numpy path to fp64 round-off on all outputs, including the
        lag-one covariances the EM step consumes.'''
        import pytest as _pytest
        from moseq2_detectron_extract_tpu.proc import kalman as K
        if not K._scan_available():
            _pytest.skip('f64 LAPACK not registered on this jax CPU backend')
        S, O, T = 12, 4, 200
        A = np.eye(S) + np.diag(np.ones(S - 1) * 0.1, 1)
        C = np.zeros((O, S))
        C[np.arange(O), np.arange(O) * 3] = 1
        params = K.KalmanParams(A, C, np.eye(S) * 0.01, np.eye(O), np.zeros(S),
                                np.eye(S))
        obs = rng.normal(0, 1, (T, O))
        missing = np.zeros(T, bool)
        missing[50:60] = True
        s_np = K.kalman_smooth(params, obs, missing, backend='numpy')
        s_scan = K.kalman_smooth(params, obs, missing, backend='scan')
        for k in ('means', 'covs', 'lag_one_covs'):
            np.testing.assert_allclose(s_np[k], s_scan[k], atol=1e-8,
                                       err_msg=k)
        for k in ('means', 'covs', 'pred_means', 'pred_covs'):
            np.testing.assert_allclose(s_np['filtered'][k],
                                       s_scan['filtered'][k], atol=1e-8,
                                       err_msg=f'filtered/{k}')

    def test_steady_backend_matches_numpy(self, rng):
        '''The Riccati-converged steady-state smoother (the no-missing fast
        path EM and per-chunk smoothing take) must agree with the numpy
        reference to fp64 round-off, including transients at both ends.'''
        from moseq2_detectron_extract_tpu.proc import kalman as K
        S, O, T = 12, 4, 300
        A = np.eye(S) + np.diag(np.ones(S - 1) * 0.1, 1)
        C = np.zeros((O, S))
        C[np.arange(O), np.arange(O) * 3] = 1
        params = K.KalmanParams(A, C, np.eye(S) * 0.01, np.eye(O),
                                np.zeros(S), np.eye(S))
        obs = rng.normal(0, 1, (T, O))
        missing = np.zeros(T, bool)
        s_np = K.kalman_smooth(params, obs, missing, backend='numpy')
        s_st = K.kalman_smooth(params, obs, missing, backend='steady')
        for k in ('means', 'covs', 'lag_one_covs'):
            np.testing.assert_allclose(s_np[k], s_st[k], atol=1e-8,
                                       err_msg=k)
        for k in ('means', 'covs', 'pred_means', 'pred_covs'):
            np.testing.assert_allclose(s_np['filtered'][k],
                                       s_st['filtered'][k], atol=1e-8,
                                       err_msg=f'filtered/{k}')
        # auto-selection: no missing -> steady; any missing -> not steady
        import pytest as _pytest
        with _pytest.raises(ValueError):
            K.kalman_smooth(params, obs, np.ones(T, bool), backend='steady')

    def test_steady_backend_short_series(self, rng):
        '''T shorter than the Riccati transient: fully exact, still equal.'''
        from moseq2_detectron_extract_tpu.proc import kalman as K
        S, O, T = 6, 2, 8
        A = np.eye(S) + np.diag(np.ones(S - 1) * 0.2, 1)
        C = np.zeros((O, S))
        C[np.arange(O), np.arange(O) * 3] = 1
        params = K.KalmanParams(A, C, np.eye(S) * 0.5, np.eye(O) * 2,
                                np.zeros(S), np.eye(S))
        obs = rng.normal(0, 1, (T, O))
        s_np = K.kalman_smooth(params, obs, np.zeros(T, bool), backend='numpy')
        s_st = K.kalman_smooth(params, obs, np.zeros(T, bool), backend='steady')
        for k in ('means', 'covs', 'lag_one_covs'):
            np.testing.assert_allclose(s_np[k], s_st[k], atol=1e-8, err_msg=k)


class TestStats:
    def test_exclude_outliers_family(self):
        from moseq2_detectron_extract_tpu.stats import (
            exclude_outliers, is_outlier, max_exclude_outliers,
            min_exclude_outliers)
        data = np.array([1.0, 1.1, 0.9, 1.05, 0.95, 50.0, -40.0])
        mask = is_outlier(data)
        assert mask[5] and mask[6] and not mask[:5].any()
        kept = exclude_outliers(data)
        assert kept.max() <= 1.1 and kept.min() >= 0.9
        assert max_exclude_outliers(data) == pytest.approx(1.1)
        assert min_exclude_outliers(data) == pytest.approx(0.9)

    def test_is_outlier_nan_tolerant(self):
        from moseq2_detectron_extract_tpu.stats import is_outlier
        data = np.array([1.0, np.nan, 1.1, 0.9, 99.0])
        mask = is_outlier(data)
        assert mask[4] and not mask[0]


class TestCcShortCircuit:
    def test_unsigned_negative_threshold_skips_cc_identically(self, rng):
        '''uint8 frames with mask_threshold<0 make the CC input all-true
        (exactly the production call, m2de/proc/proc.py:717+280); the
        short-circuited path must equal the full CC program bit-for-bit.'''
        import cv2
        from moseq2_detectron_extract_tpu.proc.features import (
            _frame_features_impl, _frame_features_nocc)
        frames = np.zeros((3, 64, 64), 'uint8')
        for i in range(3):
            cv2.ellipse(frames[i], (32, 32), (20, 9), 40.0 * i, 0, 360, 60, -1)
        frames += (rng.normal(0, 1, frames.shape) > 1.5).astype('uint8')
        model = (frames > 0).astype('uint8')

        f_full, m_full = _frame_features_impl(jnp.asarray(frames),
                                              jnp.asarray(model), 3.0, -30.0)
        f_fast, m_fast = _frame_features_nocc(jnp.asarray(frames),
                                              jnp.asarray(model), 3.0)
        np.testing.assert_array_equal(np.asarray(m_fast), np.asarray(m_full))
        for key in f_full:
            np.testing.assert_allclose(np.asarray(f_fast[key]),
                                       np.asarray(f_full[key]), rtol=1e-6)

    def test_get_frame_features_routes_to_fast_path(self, monkeypatch):
        import moseq2_detectron_extract_tpu.proc.features as feat_mod
        called = {}

        def boom(*a, **k):
            called['cc'] = True
            raise AssertionError('CC path must not run for uint8 + thresh<0')

        monkeypatch.setattr(feat_mod, '_frame_features_impl', boom)
        frames = np.zeros((2, 32, 32), 'uint8')
        frames[:, 10:20, 10:20] = 50
        feats, mask = get_frame_features(jnp.asarray(frames), mask=None,
                                         use_cc=True, frame_threshold=3)
        assert 'cc' not in called
        assert np.asarray(mask).sum() > 0


class TestWindowedFeaturePath:
    '''The pipeline's windowed feature stage must match the full-frame
    program whenever the blob fits the window (ops gather_selected_windows +
    instances_to_features(window_origins=...)).'''

    def _make_data(self, rng, n=8, h=200, w=240):
        import cv2
        # deterministic stream: the shared session fixture's position varies
        # with test order, and marginal blob geometry vs the 12px morphology
        # erosion must not depend on it
        rng = np.random.default_rng(777)
        raw = np.zeros((n, h, w), 'uint8')
        masks = np.zeros((n, h, w), 'uint8')
        centers = np.zeros((n, 2), 'float32')
        kpts = np.zeros((n, 8, 3))
        for i in range(n):
            cx, cy = int(rng.integers(40, 200)), int(rng.integers(40, 160))
            # semi-minor must comfortably survive clean_frames' 3x 9x9
            # opening (~12 px erosion depth)
            cv2.ellipse(raw[i], (cx, cy), (28, 20), float(rng.uniform(0, 360)),
                        0, 360, 60, -1)
            masks[i] = (raw[i] > 0).astype('uint8')
            centers[i] = (cx, cy)
            kpts[i, :, 0] = cx + rng.uniform(-20, 20, 8)
            kpts[i, :, 1] = cy + rng.uniform(-10, 10, 8)
            kpts[i, :, 2] = 0.9
        return raw, masks, centers, kpts

    def test_windowed_matches_fullframe(self, rng):
        from moseq2_detectron_extract_tpu.ops.instances import \
            gather_selected_windows
        from moseq2_detectron_extract_tpu.proc.features import \
            instances_to_features
        raw, masks, centers, kpts = self._make_data(rng)
        n = len(raw)
        ones = np.ones(n, int)

        full = instances_to_features(masks, kpts.copy(), ones, raw,
                                     None, None)
        from moseq2_detectron_extract_tpu.ops.instances import window_origins
        origins = window_origins(centers, raw.shape[1:], 128)
        mask_wins, sel_kpts, raw_wins = gather_selected_windows(
            jnp.asarray(masks[:, None]), jnp.asarray(kpts[:, None]),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
            jnp.asarray(origins), jnp.asarray(raw), crop=128)
        win = instances_to_features(mask_wins, sel_kpts, ones, raw_wins,
                                    None, None, window_origins=origins)

        np.testing.assert_allclose(win['features']['centroid'],
                                   full['features']['centroid'],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(win['features']['orientation'],
                                   full['features']['orientation'],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(win['flips']),
                                      np.asarray(full['flips']))
        # the windowed mask pasted back at its origin == the full-frame mask
        wins = np.asarray(win['masks'])
        org = np.asarray(origins)
        full_masks = np.asarray(full['masks'])
        for i in range(n):
            pasted = np.zeros_like(full_masks[i])
            y0, x0 = org[i]
            pasted[y0:y0 + 128, x0:x0 + 128] = wins[i]
            np.testing.assert_array_equal(pasted, full_masks[i])

    def test_windowed_matches_at_arena_corners(self, rng):
        '''Window origins clamp at the frame border; the blob still fits the
        shifted window, so parity with the full-frame program must hold.'''
        import cv2
        from moseq2_detectron_extract_tpu.ops.instances import (
            gather_selected_windows, window_origins)
        from moseq2_detectron_extract_tpu.proc.features import \
            instances_to_features
        n, h, w = 4, 200, 240
        raw = np.zeros((n, h, w), 'uint8')
        masks = np.zeros((n, h, w), 'uint8')
        centers = np.zeros((n, 2), 'float32')
        corners = [(30, 30), (210, 30), (30, 170), (210, 170)]
        for i, (cx, cy) in enumerate(corners):
            cv2.ellipse(raw[i], (cx, cy), (28, 20), 30.0 * i, 0, 360, 60, -1)
            masks[i] = (raw[i] > 0).astype('uint8')
            centers[i] = (cx, cy)
        ones = np.ones(n, int)
        full = instances_to_features(masks, np.zeros((n, 8, 3)), ones, raw,
                                     None, None)
        origins = window_origins(centers, (h, w), 128)
        assert (origins == 0).any(), 'expected clamped origins at corners'
        mask_wins, sel_kpts, raw_wins = gather_selected_windows(
            jnp.asarray(masks[:, None]), jnp.asarray(np.zeros((n, 1, 8, 3))),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
            jnp.asarray(origins), jnp.asarray(raw), crop=128)
        win = instances_to_features(mask_wins, sel_kpts, ones, raw_wins,
                                    None, None, window_origins=origins)
        np.testing.assert_allclose(win['features']['centroid'],
                                   full['features']['centroid'],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(win['features']['orientation'],
                                   full['features']['orientation'],
                                   rtol=1e-4, atol=1e-3)

    def test_windowed_z_lookup_matches(self, rng):
        from moseq2_detectron_extract_tpu.ops.instances import \
            gather_selected_windows
        from moseq2_detectron_extract_tpu.proc.features import clean_frames
        from moseq2_detectron_extract_tpu.proc.keypoints import \
            keypoints_to_dict
        raw, masks, centers, kpts = self._make_data(rng)
        n = len(raw)
        cleaned_full = np.asarray(clean_frames(jnp.asarray(raw), iters_tail=3))
        from moseq2_detectron_extract_tpu.ops.instances import window_origins
        origins = window_origins(centers, raw.shape[1:], 128)
        _, _, raw_wins = gather_selected_windows(
            jnp.asarray(masks[:, None]), jnp.asarray(kpts[:, None]),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
            jnp.asarray(origins), jnp.asarray(raw), crop=128)
        cleaned_wins = clean_frames(raw_wins, iters_tail=3)
        angles = np.zeros(n)
        full = keypoints_to_dict(kpts, cleaned_full, centers.astype(float), angles)
        win = keypoints_to_dict(kpts, cleaned_wins, centers.astype(float), angles,
                                frame_origins=origins)
        for k in full:
            if k.endswith('_z_mm'):
                np.testing.assert_allclose(win[k], full[k], atol=1e-5,
                                           err_msg=k)

    def test_windowed_no_detection_frames(self, rng):
        '''Frames without any instance (NaN centers, has_instance False)
        flow through the windowed path as NaN features + zero masks.'''
        from moseq2_detectron_extract_tpu.ops.instances import \
            gather_selected_windows
        from moseq2_detectron_extract_tpu.proc.features import \
            instances_to_features
        raw, masks, centers, kpts = self._make_data(rng, n=6)
        n = len(raw)
        num = np.ones(n, int)
        num[2] = 0
        num[5] = 0
        centers = centers.copy()
        centers[[2, 5]] = np.nan
        from moseq2_detectron_extract_tpu.ops.instances import window_origins
        origins = window_origins(centers, raw.shape[1:], 128)
        mask_wins, sel_kpts, raw_wins = gather_selected_windows(
            jnp.asarray(masks[:, None]), jnp.asarray(kpts[:, None]),
            jnp.zeros(n, jnp.int32), jnp.asarray(num > 0),
            jnp.asarray(origins), jnp.asarray(raw), crop=128)
        assert np.asarray(mask_wins)[2].sum() == 0
        assert np.isnan(np.asarray(sel_kpts)[5]).all()
        out = instances_to_features(mask_wins, sel_kpts, num, raw_wins,
                                    None, None, window_origins=origins)
        cents = out['features']['centroid']
        assert np.isnan(cents[2]).all() and np.isnan(cents[5]).all()
        assert np.isfinite(cents[[0, 1, 3, 4]]).all()
