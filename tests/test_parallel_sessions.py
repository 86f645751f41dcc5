'''Multi-session device-sharded extraction (BASELINE config #5).

Runs two synthetic sessions concurrently through `extract_sessions_sharded`
on the virtual 8-device CPU mesh, with a real (tiny, random-weight)
Mask+Keypoint R-CNN, asserting (a) each session's model params are committed
to its own device, and (b) both extractions complete end-to-end.

Reference analog: one SLURM job per session, m2de/cli.py:822-863.
'''
import os

import jax
import numpy as np
import pytest

from synthetic import make_background, write_synthetic_session

from moseq2_detectron_extract_tpu.io.image import write_image
from moseq2_detectron_extract_tpu.io.util import read_yaml
from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.predictor import Predictor
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN
from moseq2_detectron_extract_tpu.parallel.sessions import (
    _build_device_predictors, extract_sessions_sharded)

NFRAMES = 40


def tiny_predictor(batch_size=10):
    cfg = ModelConfig(
        image_size=64,
        resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16, fpn_channels=64,
        box_fc_dim=128, mask_conv_dims=(64, 64), keypoint_conv_dims=(64, 64),
        rpn_pre_nms_topk_train=64, rpn_pre_nms_topk_test=64,
        rpn_post_nms_topk_train=64, rpn_post_nms_topk_test=32,
        roi_batch_size_per_image=16, test_detections_per_image=2,
        max_gt_instances=2,
    )
    model = MaskKeypointRCNN(cfg)
    import jax.numpy as jnp
    images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images,
                        method=MaskKeypointRCNN.inference)
    return Predictor(cfg, params, batch_size=batch_size, score_threshold=0.0)


def _write_session(dirname):
    write_synthetic_session(dirname, nframes=NFRAMES)
    # sessions this short can't self-estimate a background (the mouse sits in
    # every sampled frame); pre-seed the ROI cache like a previously-touched
    # session (io/session.py find_roi cache_dir path)
    proc = os.path.join(dirname, 'proc')
    os.makedirs(proc, exist_ok=True)
    write_image(os.path.join(proc, 'bground.tiff'),
                make_background().astype('uint16'), scale=True)
    return os.path.join(dirname, 'depth.dat')


def sharded_config(predictor):
    return {
        'model': None, 'checkpoint': 'last', 'batch_size': predictor.batch_size,
        'instance_threshold': 0.0, 'expected_instances': 1,
        'allowed_detections': 2,
        'bg_roi_dilate': (10, 10), 'bg_roi_shape': 'ellipse', 'bg_roi_index': 0,
        'bg_roi_weights': (1, .1, 1), 'bg_roi_depth_range': (650, 750),
        'bg_roi_gradient_filter': False, 'bg_roi_gradient_threshold': 3000,
        'bg_roi_gradient_kernel': 7, 'bg_roi_fill_holes': True,
        'use_plane_bground': False, 'output_dir': None,
        'frame_dtype': 'uint8', 'min_height': 0, 'max_height': 100,
        'crop_size': (80, 80), 'frame_trim': (0, 0), 'chunk_size': 20,
        'chunk_overlap': 0, 'fps': 30, 'use_tracking': False,
        'debug_feature_processing': False, 'use_tracking_model': False,
        'flip_classifier': 'tiny-model', 'dataset_name': 'moseq',
        'show_progress': False, 'predictor': predictor,
    }


class TestDevicePinning:
    def test_to_device_commits_params(self):
        predictor = tiny_predictor()
        devices = jax.devices()
        assert len(devices) >= 2, 'conftest must provide the 8-device mesh'
        pinned = predictor.to_device(devices[1])
        leaves = jax.tree_util.tree_leaves(pinned.params)
        assert all(l.devices() == {devices[1]} for l in leaves)
        # original untouched
        assert all(l.devices() == {devices[0]}
                   for l in jax.tree_util.tree_leaves(predictor.params))

    def test_build_device_predictors_distinct_devices(self):
        predictor = tiny_predictor()
        devices = jax.devices()[:3]
        preds = _build_device_predictors({'predictor': predictor}, devices)
        assert len(preds) == 3
        for pred, dev in zip(preds, devices):
            leaves = jax.tree_util.tree_leaves(pred.params)
            assert all(l.devices() == {dev} for l in leaves)


class TestShardedExtraction:
    def test_two_sessions_two_devices(self, tmp_path):
        paths = [_write_session(str(tmp_path / f'sess{i}')) for i in range(2)]
        predictor = tiny_predictor()
        config = sharded_config(predictor)
        devices = jax.devices()[:2]
        results = extract_sessions_sharded(paths, config, devices=devices)

        assert set(results) == set(paths)
        for path, status_file in results.items():
            status = read_yaml(status_file)
            assert status.get('complete', False), f'{path} did not complete'
            h5_path = os.path.splitext(status_file)[0] + '.h5'
            assert os.path.exists(h5_path)
            import h5py
            with h5py.File(h5_path, 'r') as h5:
                assert h5['frames'].shape[0] == NFRAMES
