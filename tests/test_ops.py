'''Golden-value tests of device ops vs cv2/numpy oracles (SURVEY.md §4).'''
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from moseq2_detectron_extract_tpu.ops import (connected_components, crop_and_rotate_frames,
                                              dilate, erode, fill_invalid_pixels,
                                              largest_cc, make_ellipse_strel,
                                              make_rect_strel, mask_moment_features,
                                              median_blur_3x3, morph_open,
                                              plane_ransac, prep_raw_frames,
                                              reverse_crop_and_rotate_frames,
                                              scale_raw_frames)


def random_frames(rng, n=3, h=48, w=64, dtype='uint8', hi=255):
    return rng.integers(0, hi, size=(n, h, w)).astype(dtype)


class TestMorphology:
    def test_erode_matches_cv2_ellipse(self, rng):
        frames = random_frames(rng)
        strel = make_ellipse_strel((9, 9))
        ours = np.asarray(erode(jnp.asarray(frames), strel, 1))
        for i in range(frames.shape[0]):
            ref = cv2.erode(frames[i], strel, iterations=1)
            np.testing.assert_array_equal(ours[i], ref)

    def test_dilate_matches_cv2_rect(self, rng):
        frames = random_frames(rng)
        strel = make_rect_strel((5, 5))
        ours = np.asarray(dilate(jnp.asarray(frames), strel, 1))
        for i in range(frames.shape[0]):
            ref = cv2.dilate(frames[i], strel, iterations=1)
            np.testing.assert_array_equal(ours[i], ref)

    def test_open_matches_cv2(self, rng):
        frames = random_frames(rng)
        strel = make_ellipse_strel((9, 9))
        ours = np.asarray(morph_open(jnp.asarray(frames), strel, 3))
        for i in range(frames.shape[0]):
            ref = cv2.morphologyEx(frames[i], cv2.MORPH_OPEN, strel, iterations=3)
            np.testing.assert_array_equal(ours[i], ref)

    def test_median3_matches_cv2(self, rng):
        frames = random_frames(rng)
        ours = np.asarray(median_blur_3x3(jnp.asarray(frames)))
        for i in range(frames.shape[0]):
            ref = cv2.medianBlur(frames[i], 3)
            np.testing.assert_array_equal(ours[i], ref)


class TestPreprocess:
    def test_prep_subtract_clamp_cast(self, rng):
        frames = rng.integers(600, 800, size=(4, 32, 40)).astype('<i2')
        bground = np.full((32, 40), 760, dtype='float64')
        out = np.asarray(prep_raw_frames(frames, bground_im=bground, vmin=0, vmax=100,
                                         dtype='uint8', fix_invalid_pixels=False))
        expect = bground[None] - frames.astype('float64')
        expect[expect < 0] = 0
        expect[expect > 100] = 100
        np.testing.assert_allclose(out, expect.astype('uint8'))

    def test_prep_roi_crop(self, rng):
        frames = rng.integers(1, 1000, size=(2, 32, 40)).astype('<i2')
        roi = np.zeros((32, 40), bool)
        roi[4:20, 6:30] = True
        out = np.asarray(prep_raw_frames(frames, roi=roi, dtype='uint16',
                                         fix_invalid_pixels=False))
        # reference crop semantics: bbox max is inclusive-index then used as
        # exclusive slice bound -> shape (15, 23)
        assert out.shape == (2, 15, 23)

    def test_fill_invalid_small_holes(self, rng):
        # smooth ramp with a dropout hole: fill should restore within tolerance
        base = np.tile(np.linspace(50, 150, 64, dtype='float32'), (48, 1))
        frames = np.repeat(base[None], 2, axis=0).astype('uint16')
        holed = frames.copy()
        holed[:, 20:24, 30:34] = 0
        mask = holed == 0
        filled = np.asarray(fill_invalid_pixels(jnp.asarray(holed), jnp.asarray(mask)))
        err = np.abs(filled[:, 20:24, 30:34].astype(float)
                     - frames[:, 20:24, 30:34].astype(float))
        assert err.mean() < 3.0

    def test_scale_raw_frames(self):
        frames = np.array([[[0, 50, 100]]], dtype='float32')
        out = np.asarray(scale_raw_frames(frames, 0, 100, 'uint8'))
        np.testing.assert_array_equal(out, [[[0, 127, 255]]])


class TestMoments:
    def test_moment_features_vs_cv2(self):
        mask = np.zeros((64, 80), dtype='uint8')
        cv2.ellipse(mask, (40, 30), (20, 8), 30, 0, 360, 1, -1)
        feats = {k: np.asarray(v) for k, v in
                 mask_moment_features(jnp.asarray(mask[None])).items()}

        m = cv2.moments(mask, binaryImage=True)
        cx, cy = m['m10'] / m['m00'], m['m01'] / m['m00']
        np.testing.assert_allclose(feats['centroid'][0], [cx, cy], atol=1e-3)

        num, den = 2 * m['mu11'], m['mu20'] - m['mu02']
        expect_orient = -0.5 * np.arctan2(num, den)
        np.testing.assert_allclose(feats['orientation'][0], expect_orient, atol=1e-4)

        common = np.sqrt(4 * m['mu11'] ** 2 + den ** 2)
        expect_major = 2 * np.sqrt(2) * np.sqrt((m['mu20'] + m['mu02'] + common) / m['m00'])
        np.testing.assert_allclose(feats['axis_length'][0, 0], expect_major, rtol=1e-4)

    def test_empty_mask_gives_nan(self):
        feats = mask_moment_features(jnp.zeros((1, 8, 8), dtype=jnp.uint8))
        assert np.isnan(np.asarray(feats['orientation'])[0])
        assert np.isnan(np.asarray(feats['centroid'])[0]).all()


class TestConnectedComponents:
    def test_largest_cc_vs_cv2(self, rng):
        masks = np.zeros((3, 48, 64), dtype='uint8')
        for i in range(3):
            # several random blobs per frame
            for _ in range(4):
                cy, cx = rng.integers(8, 40), rng.integers(8, 56)
                r = int(rng.integers(2, 7))
                cv2.circle(masks[i], (int(cx), int(cy)), r, 1, -1)
        ours = np.asarray(largest_cc(jnp.asarray(masks)))
        for i in range(3):
            _, output, stats, _ = cv2.connectedComponentsWithStats(masks[i], connectivity=4)
            szs = stats[:, -1]
            ref = output == szs[1:].argmax() + 1
            np.testing.assert_array_equal(ours[i], ref)

    def test_labels_distinct_components(self):
        mask = np.zeros((1, 16, 16), dtype='uint8')
        mask[0, 2:5, 2:5] = 1
        mask[0, 10:14, 10:14] = 1
        labels = np.asarray(connected_components(jnp.asarray(mask)))
        vals = set(np.unique(labels[0])) - {0}
        assert len(vals) == 2

    def test_snake_component(self):
        # an S-shaped component exercises multi-sweep convergence
        mask = np.zeros((1, 32, 32), dtype='uint8')
        mask[0, 2, 2:30] = 1
        mask[0, 2:15, 29] = 1
        mask[0, 14, 2:30] = 1
        mask[0, 14:28, 2] = 1
        mask[0, 27, 2:30] = 1
        labels = np.asarray(connected_components(jnp.asarray(mask)))
        vals = set(np.unique(labels[0])) - {0}
        assert len(vals) == 1


class TestWarp:
    def _reference_crop_rotate(self, frame, center, angle, crop_size=(80, 80)):
        # mirror of m2de/proc/proc.py:305-340
        if np.isnan(angle) or np.any(np.isnan(center)) or np.any(np.asarray(center) < 0):
            return np.zeros(crop_size, frame.dtype)
        xmin = int(center[0] - crop_size[0] // 2) + crop_size[0]
        xmax = int(center[0] + crop_size[0] // 2) + crop_size[0]
        ymin = int(center[1] - crop_size[1] // 2) + crop_size[1]
        ymax = int(center[1] + crop_size[1] // 2) + crop_size[1]
        border = (crop_size[1], crop_size[1], crop_size[0], crop_size[0])
        rot_mat = cv2.getRotationMatrix2D((crop_size[0] // 2, crop_size[1] // 2), angle, 1)
        use_frame = cv2.copyMakeBorder(frame, *border, cv2.BORDER_CONSTANT, 0)
        return cv2.warpAffine(use_frame[ymin:ymax, xmin:xmax], rot_mat,
                              (crop_size[0], crop_size[1]))

    def test_crop_rotate_matches_cv2(self, rng):
        frames = rng.integers(0, 255, size=(4, 120, 160)).astype('uint8')
        centers = np.array([[80.3, 60.7], [20.0, 30.0], [150.0, 110.0], [40.5, 90.1]])
        angles = np.array([0.0, 35.0, 123.4, 270.0])
        ours = np.asarray(crop_and_rotate_frames(jnp.asarray(frames), jnp.asarray(centers),
                                                 jnp.asarray(angles), (80, 80)))
        for i in range(4):
            ref = self._reference_crop_rotate(frames[i], centers[i], angles[i]).astype('float32')
            # bilinear taps may differ by rounding at blob edges; compare loosely
            assert np.abs(ours[i] - ref).mean() < 1.0
            assert np.median(np.abs(ours[i] - ref)) <= 1.0

    def test_nan_center_zeroes(self):
        frames = jnp.ones((1, 64, 64), jnp.float32)
        out = np.asarray(crop_and_rotate_frames(frames, jnp.asarray([[np.nan, 5.0]]),
                                                jnp.asarray([10.0]), (16, 16)))
        assert (out == 0).all()

    def test_reverse_round_trip(self, rng):
        frame = np.zeros((1, 120, 160), dtype='float32')
        frame[0, 50:70, 70:100] = 1.0
        center = np.array([[85.0, 60.0]])
        angle = np.array([40.0])
        cropped = crop_and_rotate_frames(jnp.asarray(frame), jnp.asarray(center),
                                         jnp.asarray(angle), (80, 80))
        restored = np.asarray(reverse_crop_and_rotate_frames(cropped, jnp.asarray(center),
                                                             jnp.asarray(angle), (160, 120)))
        # blob mass should land back in place (bilinear blur tolerated)
        inter = ((restored[0] > 0.5) & (frame[0] > 0.5)).sum()
        union = ((restored[0] > 0.5) | (frame[0] > 0.5)).sum()
        assert inter / union > 0.85


class TestRansac:
    def test_recovers_plane(self, rng):
        h, w = 60, 80
        yy, xx = np.mgrid[0:h, 0:w]
        depth = (700 + 0.05 * xx - 0.08 * yy).astype('float64')
        noise_idx = rng.random((h, w)) < 0.05
        depth[noise_idx] -= 40  # outliers (mouse / debris)
        plane, dists = plane_ransac(depth, depth_range=(650, 750), iters=200,
                                    noise_tolerance=5.0)
        dist_im = np.asarray(dists).reshape(h, w)
        # inliers should be ~ everything except the outliers
        assert (dist_im[~noise_idx] < 5.0).mean() > 0.99


class TestCroppedMaskPacking:
    def test_round_trip_preserves_blob(self, rng):
        from moseq2_detectron_extract_tpu.ops.instances import (
            pack_masks_cropped, unpack_masks_cropped)
        masks = np.zeros((4, 200, 180), 'uint8')
        centers = np.zeros((4, 2), 'float32')
        for i in range(4):
            cy, cx = int(rng.integers(20, 180)), int(rng.integers(20, 160))
            cv2.ellipse(masks[i], (cx, cy), (24, 11), float(rng.uniform(0, 360)),
                        0, 360, 1, -1)
            centers[i] = (cx, cy)
        packed, origins = pack_masks_cropped(jnp.asarray(masks),
                                             jnp.asarray(centers), crop=96)
        out = unpack_masks_cropped(packed, origins, (200, 180), crop=96)
        np.testing.assert_array_equal(out, masks)

    def test_nan_center_and_edge_clamp(self):
        from moseq2_detectron_extract_tpu.ops.instances import (
            pack_masks_cropped, unpack_masks_cropped)
        masks = np.zeros((2, 100, 100), 'uint8')
        masks[1, :10, :10] = 1          # blob in the corner
        centers = np.asarray([[np.nan, np.nan], [2.0, 2.0]], 'float32')
        packed, origins = pack_masks_cropped(jnp.asarray(masks),
                                             jnp.asarray(centers), crop=64)
        out = unpack_masks_cropped(packed, origins, (100, 100), crop=64)
        assert out[0].sum() == 0
        np.testing.assert_array_equal(out[1], masks[1])


class TestNativePrepParity:
    '''The one-pass C++ prep core must be bit-identical to the numpy path
    (prep_raw_frames_host; native/prep_native.cpp).'''

    def _both_paths(self, monkeypatch, frames, **kw):
        from moseq2_detectron_extract_tpu.ops import preprocess
        native = preprocess.prep_raw_frames_host(np.asarray(frames), **kw)
        monkeypatch.setattr(preprocess, '_prep_frames_host_native',
                            lambda *a, **k: None)
        ref = preprocess.prep_raw_frames_host(np.asarray(frames), **kw)
        return native, ref

    def test_native_lib_builds(self):
        from moseq2_detectron_extract_tpu.native import load_prep_lib
        assert load_prep_lib() is not None

    def test_full_production_shape(self, rng, monkeypatch):
        frames = rng.integers(0, 900, size=(4, 60, 70)).astype('uint16')
        frames[rng.random(frames.shape) < 0.02] = 0  # kinect dropouts
        bg = rng.integers(600, 900, size=(60, 70)).astype('uint16')
        roi = np.zeros((60, 70), 'uint8')
        roi[5:55, 8:63] = 1
        native, ref = self._both_paths(
            monkeypatch, frames, bground_im=bg, roi=roi, vmin=10, vmax=100)
        assert native.dtype == np.uint8
        np.testing.assert_array_equal(native, ref)

    def test_roi_255_values_and_no_vmin(self, rng, monkeypatch):
        frames = rng.integers(0, 900, size=(3, 40, 40)).astype('uint16')
        bg = rng.integers(600, 900, size=(40, 40)).astype('uint16')
        roi = np.zeros((40, 40), 'uint8')
        roi[4:36, 4:36] = 255  # cv2-style mask values scale the product
        native, ref = self._both_paths(
            monkeypatch, frames, bground_im=bg, roi=roi, vmax=80)
        np.testing.assert_array_equal(native, ref)

    def test_no_bground_no_roi(self, rng, monkeypatch):
        frames = rng.integers(0, 300, size=(3, 32, 32)).astype('uint16')
        frames[0, 0, 0] = 0
        native, ref = self._both_paths(monkeypatch, frames, vmin=5, vmax=200)
        np.testing.assert_array_equal(native, ref)

    def test_uint16_output_falls_back(self, rng, monkeypatch):
        from moseq2_detectron_extract_tpu.ops import preprocess
        frames = rng.integers(0, 900, size=(2, 16, 16)).astype('uint16')
        assert preprocess._prep_frames_host_native(
            frames, None, None, 5, 100, 'uint16') is None

    def test_int16_session_dtype_takes_native_path(self, rng, monkeypatch):
        ''''<i2' is the session's on-disk depth convention
        (m2de/io/video.py:77): the native core must engage on it (it fell
        back to the ~8-pass numpy path before, 78x slower) and stay
        bit-identical.'''
        from moseq2_detectron_extract_tpu.ops import preprocess
        frames = rng.integers(0, 1200, size=(4, 60, 70)).astype('<i2')
        frames[rng.random(frames.shape) < 0.02] = 0
        bg = np.full((60, 70), 700.0, np.float32)
        roi = np.zeros((60, 70), bool)
        roi[5:55, 8:63] = True
        assert preprocess._prep_frames_host_native(
            frames, bg, roi, 10, 100, 'uint8') is not None
        native, ref = self._both_paths(
            monkeypatch, frames, bground_im=bg, roi=roi, vmin=10, vmax=100)
        np.testing.assert_array_equal(native, ref)

    def test_int16_negative_values_fall_back(self, rng):
        from moseq2_detectron_extract_tpu.ops import preprocess
        frames = rng.integers(0, 900, size=(2, 16, 16)).astype('<i2')
        frames[0, 3, 3] = -2  # int16 bits would misread as uint16 65534
        assert preprocess._prep_frames_host_native(
            frames, None, None, 5, 100, 'uint8') is None
