'''Synthetic MoSeq session generator for integration tests (SURVEY.md §4):
a depth video of a moving ellipse "mouse" over a circular arena floor.'''
import json
import os

import cv2
import numpy as np

WIDTH, HEIGHT = 192, 128
FLOOR_DEPTH = 700.0
MOUSE_HEIGHT = 50.0


def mouse_pose(i, nframes):
    '''Deterministic wandering trajectory: (cx, cy, angle_deg).'''
    t = i / max(nframes - 1, 1)
    cx = 70 + 50 * t
    cy = 60 + 18 * np.sin(2 * np.pi * t)
    ang = 20.0 * np.sin(2 * np.pi * t * 0.5)
    return cx, cy, ang


def make_background():
    '''Clean arena background (floor + walls, no mouse).

    Short synthetic sessions cannot estimate the background from every-500th
    frame like real 30-minute sessions do, so tests inject this directly.
    '''
    frame = np.zeros((HEIGHT, WIDTH), dtype='float64')
    yy, xx = np.mgrid[0:HEIGHT, 0:WIDTH]
    arena = (xx - WIDTH / 2) ** 2 + (yy - HEIGHT / 2) ** 2 < (HEIGHT / 2 - 4) ** 2
    frame[arena] = FLOOR_DEPTH
    frame[~arena] = 500.0
    return frame


def make_depth_frame(i, nframes, noise_rng=None):
    '''One synthetic uint16 depth frame.'''
    frame = np.zeros((HEIGHT, WIDTH), dtype='float64')
    # circular arena floor at FLOOR_DEPTH
    yy, xx = np.mgrid[0:HEIGHT, 0:WIDTH]
    arena = (xx - WIDTH / 2) ** 2 + (yy - HEIGHT / 2) ** 2 < (HEIGHT / 2 - 4) ** 2
    frame[arena] = FLOOR_DEPTH
    # walls closer to the camera ring the arena
    frame[~arena] = 500.0

    cx, cy, ang = mouse_pose(i, nframes)
    mouse = np.zeros((HEIGHT, WIDTH), dtype='uint8')
    cv2.ellipse(mouse, (int(round(cx)), int(round(cy))), (26, 12), ang,
                0, 360, 1, -1)
    frame[mouse > 0] = FLOOR_DEPTH - MOUSE_HEIGHT
    if noise_rng is not None:
        frame += noise_rng.normal(0, 1.0, frame.shape)
        # a few Kinect dropout pixels
        drop = noise_rng.random(frame.shape) < 0.001
        frame[drop] = 0
    return np.clip(frame, 0, 65535).astype('<u2'), mouse


def mouse_keypoints(i, nframes):
    '''Ideal keypoints along the ellipse axis, (8, 3 [x, y, score]).'''
    cx, cy, ang = mouse_pose(i, nframes)
    base = np.array([[22, 0], [17, 6], [17, -6], [13, 0],
                     [-9, 6], [-9, -6], [-15, 0], [-24, 0]], dtype=float)
    theta = np.deg2rad(ang)
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    pts = base @ rot.T + [cx, cy]
    return np.concatenate([pts, np.full((8, 1), 0.95)], axis=1)


def write_synthetic_session(dirname, nframes=60, seed=0):
    '''Write depth.dat + metadata.json + depth_ts.txt; returns depth.dat path.'''
    os.makedirs(dirname, exist_ok=True)
    rng = np.random.default_rng(seed)
    frames = np.stack([make_depth_frame(i, nframes, rng)[0] for i in range(nframes)])
    dat = os.path.join(dirname, 'depth.dat')
    frames.tofile(dat)
    with open(os.path.join(dirname, 'metadata.json'), 'w', encoding='utf-8') as fh:
        json.dump({'DepthResolution': [WIDTH, HEIGHT], 'SubjectName': 'synthetic',
                   'SessionName': 'synthetic-session', 'StartTime': '2026-01-01'}, fh)
    ts = np.arange(nframes) * (1000.0 / 30.0)
    np.savetxt(os.path.join(dirname, 'depth_ts.txt'), ts, fmt='%.3f')
    return dat


class FakePredictor:
    '''Stands in for the R-CNN: thresholds the prepped frame into a mask and
    emits the ideal keypoints (mapped into ROI-crop coordinates).'''

    def __init__(self, roi_bbox_origin=(0, 0), nframes=60, max_det=4,
                 frame_offset=0):
        self.origin = roi_bbox_origin  # (y0, x0) of ROI crop in full frame
        self.nframes = nframes
        self.max_det = max_det
        self.counter = frame_offset

    def __call__(self, frames, return_device=False, select=False):
        # select is accepted for API parity with the real Predictor; this
        # fake omits the fused keep/centers outputs, so the pipeline
        # exercises its separate-dispatch fallback path
        frames = np.asarray(frames)
        n, h, w = frames.shape[:3] if frames.ndim == 3 else frames.shape[:3]
        d, k = self.max_det, 8
        masks = np.zeros((n, d, h, w), bool)
        keypoints = np.full((n, d, k, 3), np.nan)
        scores = np.zeros((n, d))
        valid = np.zeros((n, d), bool)
        boxes = np.zeros((n, d, 4))
        y0, x0 = self.origin
        for i in range(n):
            frame_no = self.counter + i
            masks[i, 0] = frames[i] > 64  # mouse is the bright region
            kp = mouse_keypoints(frame_no, self.nframes)
            kp[:, 0] -= x0
            kp[:, 1] -= y0
            keypoints[i, 0] = kp
            scores[i, 0] = 0.9
            valid[i, 0] = True
            ys, xs = np.nonzero(masks[i, 0])
            if len(ys):
                boxes[i, 0] = [xs.min(), ys.min(), xs.max(), ys.max()]
        self.counter += n
        return {'masks': masks, 'keypoints': keypoints, 'scores': scores,
                'valid': valid, 'boxes': boxes,
                'classes': np.zeros((n, d), int),
                'mask_probs': np.zeros((n, d, 28, 28))}
