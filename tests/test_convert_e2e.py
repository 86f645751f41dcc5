'''Whole-model weight-conversion parity, end-to-end through the CLI.

A FULL Detectron2-format checkpoint (every backbone/FPN/RPN/head tensor, in
d2-native naming, exactly what the zoo ``keypoint_rcnn_R_50_FPN_3x`` file the
reference trains from looks like — m2de/model/config.py:30-35) is synthesized
with the torch-oracle helpers from tests/test_convert.py, pushed through the
actual ``convert-weights`` CLI, loaded back via ``Predictor.from_model_dir``,
and the COMPOSED forward (backbone -> FPN -> RPN head -> ROI pooling -> box /
mask / keypoint heads) is asserted against the composed torch oracle on 5
frames. The non-parametric glue between those stages (proposal NMS, delta
decoding, mask paste) carries no converted weights and has its own golden
tests; pooling uses the same ROIAlign function on both sides so the
comparison isolates exactly the converted parameters.
'''
import pickle

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from click.testing import CliRunner  # noqa: E402

from moseq2_detectron_extract_tpu.cli import cli  # noqa: E402
from moseq2_detectron_extract_tpu.models.config import ModelConfig  # noqa: E402
from moseq2_detectron_extract_tpu.models.predictor import (  # noqa: E402
    Predictor, compute_test_scale)
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN  # noqa: E402
from moseq2_detectron_extract_tpu.ops.roi_align import \
    batched_multilevel_roi_align  # noqa: E402

from tests.test_convert import (_t, _w, make_backbone_state, t_conv,  # noqa: E402
                                t_fpn, t_resnet50)

N_FRAMES = 5
FPN_C = 32          # make_backbone_state's FPN width (multiple of 32 for GN)
FC_DIM = 64
NK = 8


def full_tiny_config():
    '''Production architecture at 1/4 width: full R50 stage blocks so every
    zoo tensor has a converted destination.'''
    return ModelConfig(
        image_size=64, min_size_test=64, max_size_test=64,
        resnet_width=16, fpn_channels=FPN_C,
        box_fc_dim=FC_DIM,
        mask_conv_dims=(FPN_C,) * 4, keypoint_conv_dims=(FPN_C,) * 8,
        rpn_pre_nms_topk_test=64, rpn_post_nms_topk_test=32,
        test_detections_per_image=2, max_gt_instances=2,
        amp_dtype='float32',   # f32 compute so torch parity holds to 1e-3
    )


def make_full_state():
    '''Every tensor of the d2 checkpoint, zoo naming, matching shapes.'''
    state = make_backbone_state(width=16)
    c = FPN_C
    rpn = 'proposal_generator.rpn_head'
    state[f'{rpn}.conv.weight'] = _w(c, c, 3, 3)
    state[f'{rpn}.conv.bias'] = _w(c)
    state[f'{rpn}.objectness_logits.weight'] = _w(3, c, 1, 1)
    state[f'{rpn}.objectness_logits.bias'] = _w(3)
    state[f'{rpn}.anchor_deltas.weight'] = _w(12, c, 1, 1)
    state[f'{rpn}.anchor_deltas.bias'] = _w(12)

    state['roi_heads.box_head.fc1.weight'] = _w(FC_DIM, c * 7 * 7, scale=0.02)
    state['roi_heads.box_head.fc1.bias'] = _w(FC_DIM)
    state['roi_heads.box_head.fc2.weight'] = _w(FC_DIM, FC_DIM)
    state['roi_heads.box_head.fc2.bias'] = _w(FC_DIM)
    state['roi_heads.box_predictor.cls_score.weight'] = _w(2, FC_DIM)
    state['roi_heads.box_predictor.cls_score.bias'] = _w(2)
    state['roi_heads.box_predictor.bbox_pred.weight'] = _w(4, FC_DIM)
    state['roi_heads.box_predictor.bbox_pred.bias'] = _w(4)

    for i in range(1, 5):
        state[f'roi_heads.mask_head.mask_fcn{i}.weight'] = _w(c, c, 3, 3)
        state[f'roi_heads.mask_head.mask_fcn{i}.bias'] = _w(c)
    state['roi_heads.mask_head.deconv.weight'] = _w(c, c, 2, 2)
    state['roi_heads.mask_head.deconv.bias'] = _w(c)
    state['roi_heads.mask_head.predictor.weight'] = _w(1, c, 1, 1)
    state['roi_heads.mask_head.predictor.bias'] = _w(1)

    for i in range(1, 9):
        state[f'roi_heads.keypoint_head.conv_fcn{i}.weight'] = _w(c, c, 3, 3)
        state[f'roi_heads.keypoint_head.conv_fcn{i}.bias'] = _w(c)
    state['roi_heads.keypoint_head.score_lowres.weight'] = _w(c, NK, 4, 4)
    state['roi_heads.keypoint_head.score_lowres.bias'] = _w(NK)
    return state


@pytest.fixture(scope='module')
def converted_dir(tmp_path_factory):
    '''Run the real convert-weights CLI on the synthesized zoo .pkl.'''
    work = tmp_path_factory.mktemp('convert_e2e')
    state = make_full_state()
    pkl = work / 'zoo_model.pkl'
    with open(pkl, 'wb') as fh:
        pickle.dump({'model': state, '__author__': 'synthesized-zoo'}, fh)
    cfg_yaml = work / 'config.yaml'
    full_tiny_config().to_yaml(str(cfg_yaml))
    model_dir = work / 'model'
    result = CliRunner().invoke(cli, [
        'convert-weights', str(pkl), '--model-dir', str(model_dir),
        '--config', str(cfg_yaml)])
    assert result.exit_code == 0, result.output
    return str(model_dir), state


def _preprocess(frames, cfg):
    '''Replicate Predictor._step_impl preprocessing in numpy (identity scale
    by construction: 64px frames on a 64px canvas).'''
    assert compute_test_scale(frames.shape[1], frames.shape[2],
                              cfg.min_size_test, cfg.max_size_test) == 1.0
    x = frames.astype('float32')[..., None].repeat(3, axis=-1)
    return (x - np.asarray(cfg.pixel_mean, 'float32')) / \
        np.asarray(cfg.pixel_std, 'float32')


def _fixed_boxes():
    '''(N_FRAMES, 4, 4) boxes spanning several FPN level assignments.'''
    rng = np.random.default_rng(7)
    boxes = []
    for i in range(N_FRAMES):
        cx = rng.uniform(16, 48, 4)
        cy = rng.uniform(16, 48, 4)
        size = np.asarray([6.0, 14.0, 30.0, 56.0]) * rng.uniform(0.8, 1.2, 4)
        boxes.append(np.stack([cx - size / 2, cy - size / 2,
                               cx + size / 2, cy + size / 2], axis=-1))
    return np.clip(np.asarray(boxes, 'float32'), 0, 64)


def test_full_checkpoint_composed_parity(converted_dir):
    model_dir, state = converted_dir
    cfg = full_tiny_config()
    model = MaskKeypointRCNN(cfg)
    from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
    _, params, _ = load_model_dir(model_dir)

    frames = np.random.default_rng(3).integers(
        0, 70, (N_FRAMES, 64, 64), dtype=np.uint8)
    x = _preprocess(frames, cfg)
    boxes = _fixed_boxes()

    # ---- torch oracle: composed forward over the SAME weights ------------
    xt = _t(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        feats_t = t_resnet50(xt, state)
        pyramid_t = t_fpn(feats_t, state)          # P2..P6 NCHW
        rpn = 'proposal_generator.rpn_head'
        rpn_obj_t, rpn_del_t = [], []
        for p in pyramid_t:
            y = F.relu(t_conv(p, state, f'{rpn}.conv', pad=1))
            rpn_obj_t.append(t_conv(y, state, f'{rpn}.objectness_logits'))
            rpn_del_t.append(t_conv(y, state, f'{rpn}.anchor_deltas'))

        # pool the torch pyramid with the SAME ROIAlign the model uses, so
        # head parity isolates the converted head weights
        pyr_nhwc = tuple(jnp.asarray(p.numpy().transpose(0, 2, 3, 1))
                         for p in pyramid_t[:4])
        with jax.default_matmul_precision('highest'):
            box_pool = batched_multilevel_roi_align(
                pyr_nhwc, jnp.asarray(boxes), 7)
            mask_pool = batched_multilevel_roi_align(
                pyr_nhwc, jnp.asarray(boxes), 14)
        bp_t = _t(np.asarray(box_pool).reshape(-1, 7, 7, FPN_C)
                  .transpose(0, 3, 1, 2))
        mp_t = _t(np.asarray(mask_pool).reshape(-1, 14, 14, FPN_C)
                  .transpose(0, 3, 1, 2))

        h = F.relu(F.linear(bp_t.flatten(1),
                            _t(state['roi_heads.box_head.fc1.weight']),
                            _t(state['roi_heads.box_head.fc1.bias'])))
        h = F.relu(F.linear(h, _t(state['roi_heads.box_head.fc2.weight']),
                            _t(state['roi_heads.box_head.fc2.bias'])))
        cls_t = F.linear(h, _t(state['roi_heads.box_predictor.cls_score.weight']),
                         _t(state['roi_heads.box_predictor.cls_score.bias']))
        reg_t = F.linear(h, _t(state['roi_heads.box_predictor.bbox_pred.weight']),
                         _t(state['roi_heads.box_predictor.bbox_pred.bias']))

        y = mp_t
        for i in range(1, 5):
            y = F.relu(t_conv(y, state, f'roi_heads.mask_head.mask_fcn{i}', pad=1))
        y = F.relu(F.conv_transpose2d(
            y, _t(state['roi_heads.mask_head.deconv.weight']),
            _t(state['roi_heads.mask_head.deconv.bias']), stride=2))
        mask_t = t_conv(y, state, 'roi_heads.mask_head.predictor')

        y = bp_t
        for i in range(1, 9):
            y = F.relu(t_conv(y, state, f'roi_heads.keypoint_head.conv_fcn{i}',
                              pad=1))
        y = F.conv_transpose2d(
            y, _t(state['roi_heads.keypoint_head.score_lowres.weight']),
            _t(state['roi_heads.keypoint_head.score_lowres.bias']),
            stride=2, padding=1)
        kp_t = F.interpolate(y, scale_factor=2, mode='bilinear',
                             align_corners=False)

    # ---- ours: converted params through the flax model --------------------
    def composed(self, images, boxes):
        feats = self._features(images)
        logits, deltas = self.rpn_head(feats)
        bp = self._pool(feats, boxes, 7, train=True)
        mp = self._pool(feats, boxes, 14, train=True)
        n = boxes.shape[0] * boxes.shape[1]
        cls, reg = self.box_head(bp.reshape(n, 7, 7, -1))
        mask = self.mask_head(mp.reshape(n, 14, 14, -1))
        kp = self.keypoint_head(bp.reshape(n, 7, 7, -1))
        return feats, logits, deltas, cls, reg, mask, kp

    with jax.default_matmul_precision('highest'):
        feats, logits, deltas, cls, reg, mask, kp = model.apply(
            params, jnp.asarray(x), jnp.asarray(boxes), method=composed)

    for lvl, (ours, theirs) in enumerate(zip(feats, pyramid_t)):
        np.testing.assert_allclose(
            np.asarray(ours, 'float32'), theirs.numpy().transpose(0, 2, 3, 1),
            atol=3e-4, err_msg=f'P{lvl + 2}')
    for lvl, (ours, theirs) in enumerate(zip(logits, rpn_obj_t)):
        np.testing.assert_allclose(
            np.asarray(ours, 'float32'), theirs.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, err_msg=f'rpn objectness P{lvl + 2}')
    for lvl, (ours, theirs) in enumerate(zip(deltas, rpn_del_t)):
        np.testing.assert_allclose(
            np.asarray(ours, 'float32'), theirs.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, err_msg=f'rpn deltas P{lvl + 2}')
    np.testing.assert_allclose(np.asarray(cls), cls_t.numpy(), atol=2e-3,
                               err_msg='box cls')
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), atol=2e-3,
                               err_msg='box reg')
    np.testing.assert_allclose(
        np.asarray(mask)[..., 0], mask_t.numpy()[:, 0], atol=2e-3,
        err_msg='mask logits')
    np.testing.assert_allclose(
        np.asarray(kp), kp_t.numpy().transpose(0, 2, 3, 1), atol=2e-3,
        err_msg='keypoint logits')


def test_converted_dir_is_extract_ready(converted_dir):
    '''The CLI output loads through the normal Predictor path and runs the
    full static-shape detection program — the extract pipeline's entry.'''
    model_dir, _ = converted_dir
    predictor = Predictor.from_model_dir(model_dir, batch_size=N_FRAMES,
                                         score_threshold=0.0)
    frames = np.random.default_rng(5).integers(
        0, 70, (N_FRAMES, 64, 64), dtype=np.uint8)
    out = predictor(frames)
    assert out['masks'].shape == (N_FRAMES, 2, 64, 64)
    assert out['keypoints'].shape == (N_FRAMES, 2, NK, 3)
    for key in ('boxes', 'scores', 'keypoints'):
        assert np.isfinite(out[key]).all(), key


def test_report_covers_every_tensor(converted_dir):
    '''No synthesized zoo tensor may be silently dropped: the conversion
    report must show zero unused source keys and zero shape mismatches.'''
    _, state = converted_dir
    cfg = full_tiny_config()
    model = MaskKeypointRCNN(cfg)
    from moseq2_detectron_extract_tpu.models.convert import \
        convert_detectron2_params
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32),
                          method=MaskKeypointRCNN.init_params)
    _, report = convert_detectron2_params(state, template)
    assert not report['shape_mismatch'], report['shape_mismatch']
    assert not report['unused'], report['unused'][:10]
    assert len(report['loaded']) > 250   # full R50-FPN + all heads
