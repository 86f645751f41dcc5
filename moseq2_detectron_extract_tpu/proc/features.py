'''Feature post-processing: the brain of the extraction pipeline.

Parity target: m2de/proc/proc.py:480-515 (clean_frames), :237-302
(get_frame_features), :700-985 (instances_to_features, flip voting, alignment
scores). Frame-level image work (median/morphology, largest-CC, moments) is
batched on device; the sequential angle heuristic runs as a light host loop
over tiny Kalman matrices (6-dim state), matching the reference's per-frame
control flow exactly.
'''
import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moseq2_detectron_extract_tpu.io.util import find_unused_file_path
from moseq2_detectron_extract_tpu.ops.cc import largest_cc
from moseq2_detectron_extract_tpu.ops.moments import mask_moment_features
from moseq2_detectron_extract_tpu.ops.morphology import (make_ellipse_strel,
                                                         make_rect_strel, median_blur,
                                                         morph_open, erode,
                                                         temporal_median)
from moseq2_detectron_extract_tpu.proc.angles import iterative_filter_angles
from moseq2_detectron_extract_tpu.proc.kalman import KalmanTracker
from moseq2_detectron_extract_tpu.proc.keypoints import rotate_points_batch

_STREL_TAIL = make_ellipse_strel((9, 9))
_STREL_MIN = make_rect_strel((5, 5))


def clamp_angles_deg(angles):
    '''Clamp angles into [0, 360) — numpy, used in the per-frame host loop
    (a jnp version here would cost a device round trip per frame).'''
    angles = np.asarray(angles)
    return np.where(angles < 0, 360 + angles, angles) % 360


def angle_difference(angles1, angles2):
    '''Smallest signed difference angles2 - angles1 in degrees (numpy).'''
    diff = (np.asarray(angles2) - np.asarray(angles1)) % 360
    return np.where(diff > 180, -(360 - diff), diff)


def clean_frames(frames, prefilter_space=(3,), prefilter_time=None,
                 strel_tail=None, iters_tail: Optional[int] = None,
                 frame_dtype='uint8', strel_min=None, iters_min: Optional[int] = None):
    '''Median filter + morphological opening, batched on device
    (m2de/proc/proc.py:480-515).

    The extract-default parameter set (median3 + 9x9-ellipse open x3 on uint8)
    dispatches to the fused Pallas kernel on TPU (ops/pallas_clean.py).
    '''
    default_params = (tuple(prefilter_space or ()) == (3,) and prefilter_time is None
                      and strel_tail is None and iters_tail == 3
                      and strel_min is None and not iters_min
                      and jnp.dtype(frame_dtype) == jnp.uint8)
    if default_params and jax.default_backend() == 'tpu':
        from moseq2_detectron_extract_tpu.ops.pallas_clean import fused_clean_frames
        return fused_clean_frames(jnp.asarray(frames).astype(frame_dtype))

    x = jnp.asarray(frames).astype(frame_dtype)  # stays on device if already there
    if strel_tail is None:
        strel_tail = _STREL_TAIL
    if strel_min is None:
        strel_min = _STREL_MIN

    if iters_min is not None and iters_min > 0:
        x = erode(x, strel_min, iters_min)
    if prefilter_space is not None and np.all(np.array(prefilter_space) > 0):
        for pfs in prefilter_space:
            x = median_blur(x, int(pfs))
    if iters_tail is not None and iters_tail > 0:
        x = morph_open(x, strel_tail, iters_tail)
    if (prefilter_time is not None and np.all(np.array(prefilter_time) > 0)
            and np.all(np.array(prefilter_time) <= x.shape[0])):
        for pft in prefilter_time:
            x = temporal_median(x, int(pft))
    return x


@jax.jit
def _frame_features_impl(cleaned, model_masks, frame_threshold, mask_threshold):
    '''threshold ∧ largest-CC ∧ model-mask -> moments (device program).'''
    thresh_mask = cleaned > frame_threshold
    cc_mask = largest_cc(cleaned > mask_threshold)
    frame_mask = thresh_mask & cc_mask & (model_masks > 0)
    feats = mask_moment_features(frame_mask)
    return feats, frame_mask


@jax.jit
def _frame_features_nocc(cleaned, model_masks, frame_threshold):
    '''threshold ∧ model-mask -> moments (the CC term statically true).'''
    frame_mask = (cleaned > frame_threshold) & (model_masks > 0)
    feats = mask_moment_features(frame_mask)
    return feats, frame_mask


def get_frame_features(frames, frame_threshold: float = 10, mask=None,
                       mask_threshold: float = -30, use_cc: bool = False):
    '''Image-moment features of the largest blob per frame
    (m2de/proc/proc.py:237-302, minus the contour detour — see ops/moments.py).

    Returns (features, masks) where features has centroid (N,2),
    orientation (N,), axis_length (N,2); masks is the (N,H,W) boolean mask
    used for the moments.
    '''
    frames = jnp.asarray(frames)
    if mask is None or (isinstance(mask, np.ndarray) and mask.size == 0):
        model_masks = jnp.ones(frames.shape, jnp.uint8)
    else:
        model_masks = jnp.asarray(mask).astype(jnp.uint8)

    # The CC input is ``frames > mask_threshold``; the production call
    # (mirroring m2de/proc/proc.py:717 + :280) feeds uint8 cleaned frames
    # with mask_threshold=-30, so that input is ALL-foreground and the
    # largest component is statically the whole frame. The reference burns
    # a per-frame cv2 CC on it anyway; skipping it here removes the most
    # expensive device program in the feature stage (~3.4 s per 1000-frame
    # chunk measured) with bit-identical output.
    cc_trivially_true = (use_cc and mask_threshold < 0
                         and jnp.issubdtype(frames.dtype, jnp.unsignedinteger))
    if use_cc and not cc_trivially_true:
        feats, frame_mask = _frame_features_impl(frames, model_masks,
                                                 float(frame_threshold),
                                                 float(mask_threshold))
    else:
        feats, frame_mask = _frame_features_nocc(frames, model_masks,
                                                 float(frame_threshold))

    features = {
        'centroid': np.asarray(feats['centroid'], dtype=float),
        'orientation': np.asarray(feats['orientation'], dtype=float),
        'axis_length': np.asarray(feats['axis_length'], dtype=float),
    }
    # frame_mask stays a device array: callers crop/reduce it on device and
    # only compact data ever crosses to the host
    return features, frame_mask


def flips_from_keypoints(keypoints: np.ndarray, centroids: np.ndarray,
                         angles: np.ndarray, length=80):
    '''Front/rear keypoint-group vote on whether angles are flipped
    (m2de/proc/proc.py:851-889). Returns (flips bool (N,), confidence (N,)).'''
    front_keypoints = [0, 1, 2, 3]
    rear_keypoints = [4, 5, 6]

    rotated = rotate_points_batch(np.copy(keypoints), centroids, angles)
    extent_x_min = centroids[:, 0] - (np.asarray(length) / 2)
    extent_x_max = centroids[:, 0] + (np.asarray(length) / 2)
    left_dist = np.abs(extent_x_min[:, None] - rotated[:, :, 0])
    right_dist = np.abs(extent_x_max[:, None] - rotated[:, :, 0])
    scores = np.where(left_dist < right_dist, -1, 1)
    front_votes = np.mean(scores[:, front_keypoints], axis=1)
    rear_votes = np.mean(scores[:, rear_keypoints], axis=1)
    flips = front_votes < rear_votes

    expected = np.where(flips[:, None], np.array([-1, 1]), np.array([1, -1]))
    agree = (np.count_nonzero(scores[:, front_keypoints] == expected[:, 0, None], axis=1)
             + np.count_nonzero(scores[:, rear_keypoints] == expected[:, 1, None], axis=1))
    conf = agree / (len(front_keypoints) + len(rear_keypoints))
    return flips, conf


def calc_keypoint_keypoint_distance(keypoints: np.ndarray, metric: str = 'x') -> np.ndarray:
    '''Pairwise keypoint distance matrix (m2de/proc/proc.py:910-933),
    vectorized.'''
    keypoints = np.asarray(keypoints, dtype=float)
    x = keypoints[..., 0]
    y = keypoints[..., 1]
    if metric == 'euclidean':
        dx = x[..., :, None] - x[..., None, :]
        dy = y[..., :, None] - y[..., None, :]
        return np.sqrt(dx ** 2 + dy ** 2)
    if metric == 'x':
        return x[..., :, None] - x[..., None, :]
    if metric == 'y':
        return y[..., :, None] - y[..., None, :]
    raise ValueError(f'unknown metric {metric}')


def get_expected_keypoint_alignment() -> np.ndarray:
    '''Expected east-west sign matrix for the 7 non-tail keypoints
    (m2de/proc/proc.py:960-985).'''
    return np.array([
        [0, 1, 1, 1, 1, 1, 1],
        [-1, 0, 0, 1, 1, 1, 1],
        [-1, 0, 0, 1, 1, 1, 1],
        [-1, -1, -1, 0, 1, 1, 1],
        [-1, -1, -1, -1, 0, 0, 1],
        [-1, -1, -1, -1, 0, 0, 1],
        [-1, -1, -1, -1, -1, -1, 0],
    ])


def compute_keypoint_alignment_scores(keypoints: np.ndarray,
                                      expected_alignment: Optional[np.ndarray] = None):
    '''Fraction of pairwise x-order expectations met (m2de/proc/proc.py:936-957).'''
    if expected_alignment is None:
        expected_alignment = get_expected_keypoint_alignment()
    distances = calc_keypoint_keypoint_distance(keypoints)
    signs = np.sign(distances)
    masked = np.where(expected_alignment == 0, 0, signs)
    axis = (1, 2) if keypoints.ndim == 3 else None
    met = (np.count_nonzero(masked == expected_alignment, axis=axis)
           - np.count_nonzero(expected_alignment == 0))
    return met / np.count_nonzero(expected_alignment)


def estimate_keypoint_rotation(keypoints: np.ndarray) -> np.ndarray:
    '''Median frame-to-frame angular change of keypoints
    (m2de/proc/proc.py:892-907).'''
    angles = np.arctan2(keypoints[..., 1], keypoints[..., 0])
    angles = np.asarray(clamp_angles_deg(np.rad2deg(angles)))
    angles = np.diff(angles, axis=0, prepend=angles[0, None, ...])
    angles = angles % 360
    to_min = angles > 180
    angles[to_min] = -(360 - angles[to_min])
    return np.median(angles, axis=1)


def dispatch_instance_features(masks, raw_frames, window_origins=None) -> Dict:
    '''Dispatch the feature stage's device programs (clean + moments) WITHOUT
    any host synchronization; returns device handles for
    ``finish_instance_features``.

    Splitting dispatch from the host brain lets the pipeline overlap chunk
    N's device execution with chunk N-1's host Kalman work and chunk N+1's
    selection (the reference's process-stage boundary at
    m2de/pipeline/process_features_step.py:163 is synchronous; here only the
    data dependency is).
    '''
    cleaned_frames = clean_frames(raw_frames, iters_tail=3)  # device array
    if window_origins is not None:
        feats_dev, feat_masks = _frame_features_nocc(
            cleaned_frames, jnp.asarray(masks), 3.0)
        origins = jnp.asarray(window_origins)
        offset = origins[:, ::-1].astype(feats_dev['centroid'].dtype)  # x, y
        feats_dev = dict(feats_dev)
        feats_dev['centroid'] = feats_dev['centroid'] + offset
    else:
        # production call shape (uint8 cleaned, mask_threshold < 0): the CC
        # term is statically all-true — see get_frame_features
        if masks is None or (isinstance(masks, np.ndarray) and masks.size == 0):
            model_masks = jnp.ones(cleaned_frames.shape, jnp.uint8)
        else:
            model_masks = jnp.asarray(masks).astype(jnp.uint8)
        feats_dev, feat_masks = _frame_features_nocc(
            cleaned_frames, model_masks, 3.0)
    return {
        'cleaned_frames': cleaned_frames,
        'feat_masks': feat_masks,
        'feats_dev': feats_dev,
        'window_origins': window_origins,
    }


def finish_instance_features(dispatched: Dict, keypoints: np.ndarray,
                             num_instances: np.ndarray,
                             point_tracker: Optional[KalmanTracker],
                             angle_tracker: Optional[KalmanTracker],
                             debug: bool = False, debug_dir: str = '.',
                             timers: Optional[Dict[str, float]] = None) -> Dict:
    '''Pull the dispatched moments and run the sequential host brain
    (Kalman smoothing, flip votes, angle interventions). Returns the same
    dict as ``instances_to_features``.'''
    import time as _time

    def _mark(name, t_prev):
        now = _time.perf_counter()
        if timers is not None:
            timers[name] = timers.get(name, 0.0) + (now - t_prev)
        return now

    _t = _time.perf_counter()
    keypoints = np.array(np.asarray(keypoints), dtype=float)
    cleaned_frames = dispatched['cleaned_frames']
    feat_masks = dispatched['feat_masks']
    feats_dev = dispatched['feats_dev']
    window_origins = dispatched['window_origins']
    features = {
        'centroid': np.asarray(feats_dev['centroid'], dtype=float),
        'orientation': np.asarray(feats_dev['orientation'], dtype=float),
        'axis_length': np.asarray(feats_dev['axis_length'], dtype=float),
    }
    _t = _mark('itf_moments', _t)

    with np.errstate(invalid='ignore'):
        lengths = np.max(features['axis_length'], axis=1)
        aspects = np.min(features['axis_length'], axis=1) / np.max(features['axis_length'], axis=1)
    angles = np.array(clamp_angles_deg(-np.rad2deg(features['orientation'])))

    debug_rows = []
    orig_angles = np.copy(angles) if debug else None

    if point_tracker is not None and angle_tracker is not None:
        if not point_tracker.is_initialized:
            point_tracker.initialize([features['centroid'], keypoints[:, :, :2]])

        s_centroids, s_kpts = point_tracker.smooth_update(
            [features['centroid'], keypoints[:, :, :2]])
        features['centroid'] = np.asarray(s_centroids)
        # keep inferred tail tip: tracking lags the fast-moving tail
        keypoints[:, :7, :2] = np.asarray(s_kpts)[:, :7, :]
        _t = _mark('itf_kalman_smooth', _t)

        flips, flip_confs = flips_from_keypoints(keypoints, features['centroid'],
                                                 angles, lengths)
        angles[flips] = np.asarray(clamp_angles_deg(angles[flips] + 180))
        post_kp_flip_angles = angles.copy() if debug else None

        rot_kpts = rotate_points_batch(np.copy(keypoints[:, :7, :2]),
                                       features['centroid'], angles)
        kpt_alignment_scores = compute_keypoint_alignment_scores(rot_kpts)
        kpt_rotations = estimate_keypoint_rotation(rot_kpts)

        if not angle_tracker.is_initialized:
            angle_tracker.initialize([angles])

        if not debug:
            # production path: the whole per-frame sample -> intervene ->
            # filter_update recurrence runs as ONE jitted lax.scan (f64 CPU)
            # instead of N sequential Python iterations
            # (m2de/proc/proc.py:769-818; see kalman.angle_intervention_filter)
            from moseq2_detectron_extract_tpu.proc.kalman import \
                angle_intervention_filter
            item = angle_tracker.items[0]
            out_angles, flip_deltas, last_mean, last_cov = \
                angle_intervention_filter(
                    angle_tracker.params, angle_tracker.last_mean,
                    angle_tracker.last_covar, angles, kpt_alignment_scores,
                    order=item.order)
            angle_tracker.last_mean = np.asarray(last_mean)
            angle_tracker.last_covar = np.asarray(last_cov)
            angles = np.asarray(out_angles)
            flips = np.logical_xor(flips, np.asarray(flip_deltas))
            features['orientation'] = np.array(angles)
            _mark('itf_angle_filter', _t)
            return {
                'cleaned_frames': cleaned_frames,
                'masks': feat_masks,
                'mask_origins': window_origins,
                'features': features,
                'flips': flips,
                'keypoints': keypoints,
                'num_instances': np.asarray(num_instances),
            }

        for i in range(angles.shape[0]):
            p_next_angle, = angle_tracker.sample(1)
            rel_angle_dist = float(np.asarray(
                angle_difference(p_next_angle, angles[[i]]))[0])

            if kpt_alignment_scores[i] < 0.4:
                angles[i] = p_next_angle[0]
                intervention = 'low kp algn score, defer to sample'
            elif np.abs(rel_angle_dist) > 140:
                angles[i] = float(np.asarray(clamp_angles_deg(angles[i] + 180)))
                flips[i] = ~flips[i]
                intervention = 'flip 180'
            else:
                intervention = None

            rel_angle_dist2 = float(np.asarray(
                angle_difference(p_next_angle, angles[[i]]))[0])
            t_angle, = angle_tracker.filter_update([angles[[i]]])

            if debug:
                debug_rows.append({
                    'i': i, 'aspect': aspects[i],
                    'kpt_flip_opinion': flips[i], 'kpt_flip_conf': flip_confs[i],
                    'kpt_align_score': kpt_alignment_scores[i],
                    'kpt_rotation': kpt_rotations[i],
                    'angle_in': orig_angles[i],
                    'post_kp_flip_angle': post_kp_flip_angles[i],
                    'sample_angle': p_next_angle[0], 'filt_angle': t_angle[0],
                    'rel_angle_dist': rel_angle_dist,
                    'rel_angle_dist2': rel_angle_dist2,
                    'intervention': intervention, 'angle_out': angles[i],
                })

        features['orientation'] = np.array(angles)

        if debug:
            _dump_debug_rows(debug_rows, os.path.join(debug_dir, 'flip_info.tsv'))
    else:
        flips, _ = flips_from_keypoints(keypoints, features['centroid'], angles, lengths)
        angles[flips] += 180
        angles_j, filter_flips = iterative_filter_angles(angles)
        features['orientation'] = np.asarray(angles_j)
        flips = np.logical_xor(flips, np.asarray(filter_flips))

    return {
        'cleaned_frames': cleaned_frames,
        'masks': feat_masks,
        'mask_origins': window_origins,
        'features': features,
        'flips': flips,
        'keypoints': keypoints,
        'num_instances': np.asarray(num_instances),
    }


def instances_to_features(masks: np.ndarray, keypoints: np.ndarray,
                          num_instances: np.ndarray, raw_frames: np.ndarray,
                          point_tracker: Optional[KalmanTracker],
                          angle_tracker: Optional[KalmanTracker],
                          debug: bool = False, debug_dir: str = '.',
                          timers: Optional[Dict[str, float]] = None,
                          window_origins=None) -> Dict:
    '''Feature post-processing brain (m2de/proc/proc.py:700-848).

    masks: (N, H, W) model mask of the selected instance (uint8/bool);
    keypoints: (N, K, 3 [x, y, score]); num_instances: (N,);
    raw_frames: (N, H, W) prepped depth frames.
    With trackers: Kalman smoothing + keypoint flip votes + per-frame angle
    heuristic. Without: flip votes + iterative 180-degree angle filtering.

    Windowed mode (the extraction pipeline): when ``window_origins``
    (N, 2 [y0, x0]) is given, ``masks`` and ``raw_frames`` are (N, c, c)
    windows around each detection (ops/instances.py:gather_selected_windows)
    and the whole clean/moments stage runs at window size — ~8x less device
    work than full frames. Centroids are reported in full-frame coords.
    Equivalent to the full-frame program whenever the blob fits the window
    (guaranteed by the detection for any mouse smaller than the window).
    The returned ``masks``/``cleaned_frames`` are windows; consumers get the
    origins back as ``mask_origins``.

    This is the synchronous convenience wrapper over
    ``dispatch_instance_features`` + ``finish_instance_features`` (the
    extraction pipeline calls those directly so device execution overlaps
    host work across chunks).
    '''
    dispatched = dispatch_instance_features(masks, raw_frames,
                                            window_origins=window_origins)
    return finish_instance_features(dispatched, keypoints, num_instances,
                                    point_tracker, angle_tracker, debug=debug,
                                    debug_dir=debug_dir, timers=timers)


def _dump_debug_rows(rows, path):
    if not rows:
        return
    path = find_unused_file_path(path)
    try:
        keys = list(rows[0].keys())
        with open(path, 'w', encoding='utf-8') as fh:
            fh.write('\t'.join(keys) + '\n')
            for row in rows:
                fh.write('\t'.join(str(row[k]) for k in keys) + '\n')
    except OSError:
        logging.warning('could not write debug flip info to %s', path)
