'''End-to-end extraction test on a synthetic session (no trained model:
a FakePredictor supplies masks/keypoints so the whole pipeline — session IO,
ROI discovery, preprocessing, feature brain, crop/rotate, h5/tsv/mp4 writers —
is exercised for real).'''
import os

import h5py
import numpy as np
import pytest

from synthetic import (FakePredictor, make_background, write_synthetic_session,
                       FLOOR_DEPTH, MOUSE_HEIGHT)

from moseq2_detectron_extract_tpu.extract import extract_session
from moseq2_detectron_extract_tpu.io.session import Session
from moseq2_detectron_extract_tpu.io.util import read_yaml
from moseq2_detectron_extract_tpu.ops.preprocess import bbox_from_roi


def base_config(output_dir, **overrides):
    config = {
        'model': None,
        'checkpoint': 'last',
        'batch_size': 10,
        'instance_threshold': 0.5,
        'expected_instances': 1,
        'allowed_detections': 4,
        'bg_roi_dilate': (10, 10),
        'bg_roi_shape': 'ellipse',
        'bg_roi_index': 0,
        'bg_roi_weights': (1, .1, 1),
        'bg_roi_depth_range': (650, 750),
        'bg_roi_gradient_filter': False,
        'bg_roi_gradient_threshold': 3000,
        'bg_roi_gradient_kernel': 7,
        'bg_roi_fill_holes': True,
        'use_plane_bground': False,
        'output_dir': output_dir,
        'frame_dtype': 'uint8',
        'min_height': 0,
        'max_height': 100,
        'crop_size': (80, 80),
        'frame_trim': (0, 0),
        'chunk_size': 25,
        'chunk_overlap': 0,
        'fps': 30,
        'use_tracking': False,
        'debug_feature_processing': False,
        'use_tracking_model': False,
        'flip_classifier': 'fake-model',
        'dataset_name': 'moseq',
        'show_progress': False,
    }
    config.update(overrides)
    return config


@pytest.fixture(scope='module')
def session_dir(tmp_path_factory):
    dirname = str(tmp_path_factory.mktemp('synthetic_session'))
    write_synthetic_session(dirname, nframes=60)
    return dirname


class TestExtractIntegration:
    def _run(self, session_dir, tmp_path, **overrides):
        session = Session(os.path.join(session_dir, 'depth.dat'))
        out_dir = str(tmp_path / 'proc')
        config = base_config(out_dir, **overrides)

        # a 60-frame session can't self-estimate its background (the mouse sits
        # in every sampled frame) - inject the clean one like a cached session
        session._bground_im = make_background()
        # discover ROI to learn the crop origin for the fake predictor
        session.find_roi(bg_roi_depth_range=config['bg_roi_depth_range'])
        bbox = bbox_from_roi(session.roi)
        config['predictor'] = FakePredictor(roi_bbox_origin=bbox[0], nframes=60)
        status = extract_session(session, config)
        return session, status, out_dir

    def test_full_extraction(self, session_dir, tmp_path):
        session, status, out_dir = self._run(session_dir, tmp_path)

        status_data = read_yaml(status)
        assert status_data['complete'], 'extraction did not complete'

        h5_path = os.path.join(out_dir, 'results_00.h5')
        assert os.path.exists(h5_path)
        with h5py.File(h5_path, 'r') as h5:
            frames = h5['frames'][()]
            masks = h5['frames_mask'][()]
            assert frames.shape == (60, 80, 80)
            assert masks.shape == (60, 80, 80)
            # cropped frames should contain the mouse (height ~50mm)
            center_patch = frames[:, 30:50, 30:50]
            assert center_patch.mean() > 20, 'mouse not centered in crops'

            area = h5['scalars/area_px'][()]
            assert (area > 300).all(), 'mouse area implausible'
            centroid_x = h5['scalars/centroid_x_px'][()]
            assert np.isfinite(centroid_x).all()
            # mouse moves east over the session (in ROI-crop coords)
            assert centroid_x[-1] > centroid_x[0] + 20

            height = h5['scalars/height_ave_mm'][()]
            assert np.abs(height - MOUSE_HEIGHT).max() < 15

            nose_x = h5['keypoints/reference/Nose_x_px'][()]
            assert np.isfinite(nose_x).all()
            # nose leads the centroid (east-facing): usually ahead in x
            assert (nose_x > centroid_x).mean() > 0.8

            flips = h5['metadata/extraction/flips'][()]
            assert flips.shape == (60,)
            assert h5['timestamps'].shape == (60,)
            assert h5['metadata/extraction/true_depth'][()] == \
                pytest.approx(FLOOR_DEPTH, abs=5)

        assert os.path.exists(os.path.join(out_dir, 'keypoints_00.tsv'))
        assert os.path.exists(os.path.join(out_dir, 'results_00.mp4'))
        assert os.path.exists(os.path.join(out_dir, 'instance_log.tsv'))
        self._check_preview_overlays(os.path.join(out_dir, 'results_00.mp4'))
        # ROI cache TIFFs
        assert os.path.exists(os.path.join(out_dir, 'bground.tiff'))
        assert os.path.exists(os.path.join(out_dir, 'roi_00.tiff'))

    @staticmethod
    def _check_preview_overlays(mp4_path):
        '''The live preview must visibly contain instance overlays (reference
        m2de/pipeline/preview_video_writer_step.py:93-114): the arena base is
        grayscale (R=G=B), so drawn overlays (green ROI contour/boxes, red
        mask fill, colored keypoints/skeleton) appear as chromatic pixels.'''
        import cv2
        cap = cv2.VideoCapture(mp4_path)
        try:
            cap.set(cv2.CAP_PROP_POS_FRAMES, 10)
            ok, frame = cap.read()
            assert ok, 'could not read preview frame'
            frame = frame.astype('int16')
            # right panel = arena view (left panels are jet-colorized crops)
            arena = frame[:, frame.shape[1] - 200:]
            chroma = np.abs(arena[..., 0] - arena[..., 1]) + \
                np.abs(arena[..., 1] - arena[..., 2])
            n_colored = int((chroma > 40).sum())
            assert n_colored > 100, \
                f'arena panel has no drawn overlays ({n_colored} colored px)'
        finally:
            cap.release()

    def test_skip_already_extracted(self, session_dir, tmp_path):
        session, status, out_dir = self._run(session_dir, tmp_path)
        assert read_yaml(status)['complete']
        # second run should skip without touching results
        mtime = os.path.getmtime(os.path.join(out_dir, 'results_00.h5'))
        session2 = Session(os.path.join(session_dir, 'depth.dat'))
        config = base_config(out_dir)
        status2 = extract_session(session2, config)
        assert status2 == status
        assert os.path.getmtime(os.path.join(out_dir, 'results_00.h5')) == mtime

    def test_chunk_overlap(self, session_dir, tmp_path):
        session, status, out_dir = self._run(session_dir, tmp_path,
                                             chunk_size=25, chunk_overlap=5)
        assert read_yaml(status)['complete']
        with h5py.File(os.path.join(out_dir, 'results_00.h5'), 'r') as h5:
            area = h5['scalars/area_px'][()]
            assert (area > 300).all(), 'overlap writing left gaps'


class TestPrescaledPipeline:
    def test_prescaled_mode_runs_end_to_end(self, session_dir, tmp_path):
        '''device_input='prescaled' drives the host-resized inference path +
        host-sliced feature windows through the whole pipeline (real tiny
        predictor; random weights at threshold 0 so detections exist).'''
        import jax
        from moseq2_detectron_extract_tpu.models.config import ModelConfig
        from moseq2_detectron_extract_tpu.models.predictor import Predictor
        from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN

        session = Session(os.path.join(session_dir, 'depth.dat'))
        out_dir = str(tmp_path / 'proc')
        config = base_config(out_dir, instance_threshold=0.0,
                             device_input='prescaled', batch_size=10,
                             chunk_size=30)
        session._bground_im = make_background()
        session.find_roi(bg_roi_depth_range=config['bg_roi_depth_range'])

        cfg = ModelConfig(
            image_size=64, resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16,
            fpn_channels=32, box_fc_dim=32, mask_conv_dims=(16,),
            keypoint_conv_dims=(16,), rpn_pre_nms_topk_test=16,
            rpn_post_nms_topk_test=8, test_detections_per_image=2,
            test_score_thresh=0.0)
        model = MaskKeypointRCNN(cfg)
        import jax.numpy as jnp
        images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images,
                            method=MaskKeypointRCNN.inference)
        config['predictor'] = Predictor(cfg, params, batch_size=10,
                                        score_threshold=0.0)

        status = extract_session(session, config)
        status_data = read_yaml(status)
        assert status_data['complete'], 'prescaled extraction did not complete'
        h5_path = os.path.join(out_dir, 'results_00.h5')
        with h5py.File(h5_path, 'r') as h5:
            assert h5['frames'].shape == (60, 80, 80)
            assert h5['frames_mask'].shape == (60, 80, 80)
            assert np.isfinite(h5['scalars/centroid_x_px'][()]).any()
        assert os.path.exists(os.path.join(out_dir, 'results_00.mp4'))
