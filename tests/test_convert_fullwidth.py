'''Full-width (zoo-shape) weight-conversion proof.

The tiny-config e2e test (tests/test_convert_e2e.py) validates the converter
at 1/4 width; this module synthesizes a COMPLETE checkpoint at the REAL
``keypoint_rcnn_R_50_FPN_3x`` production shapes — R50 width 64, FPN 256,
box fc 1024, mask convs 256x4, keypoint convs 512x8, 8 keypoints — exactly
the tensor set a fine-tuned reference checkpoint carries
(m2de/model/config.py:30-56 trains NUM_KEYPOINTS=8 / NUM_CLASSES=1 heads on
top of the zoo backbone), runs it through the actual ``convert-weights``
CLI at the production 256-px canvas config, and asserts:

1. ZERO unmapped / shape-mismatched / template-init tensors — a transpose
   or naming bug that only appears at full width cannot ship silently.
2. f32 parity of the COMPOSED forward (backbone -> FPN -> RPN head -> ROI
   pooling -> box/mask/keypoint heads) against the torch oracle at the
   production canvas.
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
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN  # noqa: E402
from moseq2_detectron_extract_tpu.ops.roi_align import \
    batched_multilevel_roi_align  # noqa: E402

from tests.test_convert import (_t, _w, make_backbone_state, t_conv,  # noqa: E402
                                t_fpn, t_resnet50)

N_FRAMES = 2
CANVAS = 256
FPN_C = 256
FC_DIM = 1024
MASK_C = 256
KP_C = 512
NK = 8


def production_config():
    '''The shipping ModelConfig at f32 (so torch parity holds tightly), with
    the canvas treated as the test size so preprocessing is the identity.'''
    return ModelConfig(
        min_size_test=CANVAS, max_size_test=CANVAS,
        amp_dtype='float32',
    )


def make_full_zoo_state():
    '''Every tensor of a production-shape d2 checkpoint, zoo naming.'''
    state = make_backbone_state(width=64, fpn_c=FPN_C)
    c = FPN_C
    rpn = 'proposal_generator.rpn_head'
    state[f'{rpn}.conv.weight'] = _w(c, c, 3, 3, scale=0.02)
    state[f'{rpn}.conv.bias'] = _w(c)
    state[f'{rpn}.objectness_logits.weight'] = _w(3, c, 1, 1)
    state[f'{rpn}.objectness_logits.bias'] = _w(3)
    state[f'{rpn}.anchor_deltas.weight'] = _w(12, c, 1, 1)
    state[f'{rpn}.anchor_deltas.bias'] = _w(12)

    state['roi_heads.box_head.fc1.weight'] = _w(FC_DIM, c * 7 * 7, scale=0.01)
    state['roi_heads.box_head.fc1.bias'] = _w(FC_DIM)
    state['roi_heads.box_head.fc2.weight'] = _w(FC_DIM, FC_DIM, scale=0.01)
    state['roi_heads.box_head.fc2.bias'] = _w(FC_DIM)
    state['roi_heads.box_predictor.cls_score.weight'] = _w(2, FC_DIM, scale=0.01)
    state['roi_heads.box_predictor.cls_score.bias'] = _w(2)
    state['roi_heads.box_predictor.bbox_pred.weight'] = _w(4, FC_DIM, scale=0.01)
    state['roi_heads.box_predictor.bbox_pred.bias'] = _w(4)

    for i in range(1, 5):
        state[f'roi_heads.mask_head.mask_fcn{i}.weight'] = \
            _w(MASK_C, MASK_C if i > 1 else c, 3, 3, scale=0.02)
        state[f'roi_heads.mask_head.mask_fcn{i}.bias'] = _w(MASK_C)
    state['roi_heads.mask_head.deconv.weight'] = _w(MASK_C, MASK_C, 2, 2,
                                                    scale=0.02)
    state['roi_heads.mask_head.deconv.bias'] = _w(MASK_C)
    state['roi_heads.mask_head.predictor.weight'] = _w(1, MASK_C, 1, 1)
    state['roi_heads.mask_head.predictor.bias'] = _w(1)

    for i in range(1, 9):
        state[f'roi_heads.keypoint_head.conv_fcn{i}.weight'] = \
            _w(KP_C, KP_C if i > 1 else c, 3, 3, scale=0.02)
        state[f'roi_heads.keypoint_head.conv_fcn{i}.bias'] = _w(KP_C)
    state['roi_heads.keypoint_head.score_lowres.weight'] = _w(KP_C, NK, 4, 4,
                                                              scale=0.02)
    state['roi_heads.keypoint_head.score_lowres.bias'] = _w(NK)
    return state


@pytest.fixture(scope='module')
def converted_full(tmp_path_factory):
    '''Run the real convert-weights CLI on the full-width synthesized .pkl.'''
    work = tmp_path_factory.mktemp('convert_fullwidth')
    state = make_full_zoo_state()
    pkl = work / 'zoo_full.pkl'
    with open(pkl, 'wb') as fh:
        pickle.dump({'model': state, '__author__': 'synthesized-zoo-full'}, fh)
    cfg_yaml = work / 'config.yaml'
    production_config().to_yaml(str(cfg_yaml))
    model_dir = work / 'model'
    result = CliRunner().invoke(cli, [
        'convert-weights', str(pkl), '--model-dir', str(model_dir),
        '--config', str(cfg_yaml)])
    assert result.exit_code == 0, result.output
    return str(model_dir), state


def test_full_width_zero_unmapped(converted_full):
    '''At zoo shapes every tensor must land: no unused source keys, no shape
    mismatches, no template-init leaves among mapped destinations.'''
    _, state = converted_full
    cfg = production_config()
    model = MaskKeypointRCNN(cfg)
    from moseq2_detectron_extract_tpu.models.convert import \
        convert_detectron2_params
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, CANVAS, CANVAS, 3), jnp.float32),
                          method=MaskKeypointRCNN.init_params)
    _, report = convert_detectron2_params(state, template)
    assert not report['shape_mismatch'], report['shape_mismatch']
    assert not report['unused'], report['unused'][:10]
    assert not report['missing_in_source'], report['missing_in_source'][:10]
    # full R50 (53 convs + BNs) + FPN (8 convs + GNs) + all heads
    assert len(report['loaded']) > 250


def test_full_width_composed_parity(converted_full):
    '''f32 parity of the composed forward vs the torch oracle at the
    production canvas and full widths.'''
    model_dir, state = converted_full
    cfg = production_config()
    model = MaskKeypointRCNN(cfg)
    from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
    _, params, _ = load_model_dir(model_dir)

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 70, (N_FRAMES, CANVAS, CANVAS), dtype=np.uint8)
    x = (frames.astype('float32')[..., None].repeat(3, axis=-1)
         - np.asarray(cfg.pixel_mean, 'float32')) / \
        np.asarray(cfg.pixel_std, 'float32')

    # boxes spanning all FPN level assignments at the 256 canvas
    cx = rng.uniform(60, 200, (N_FRAMES, 4))
    cy = rng.uniform(60, 200, (N_FRAMES, 4))
    size = np.asarray([20.0, 60.0, 120.0, 230.0]) * \
        rng.uniform(0.9, 1.1, (N_FRAMES, 4))
    boxes = np.clip(np.stack([cx - size / 2, cy - size / 2,
                              cx + size / 2, cy + size / 2], axis=-1),
                    0, CANVAS).astype('float32')

    # ---- torch oracle ------------------------------------------------------
    xt = _t(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        feats_t = t_resnet50(xt, state)
        pyramid_t = t_fpn(feats_t, state)
        rpn = 'proposal_generator.rpn_head'
        rpn_obj_t = []
        for p in pyramid_t:
            y = F.relu(t_conv(p, state, f'{rpn}.conv', pad=1))
            rpn_obj_t.append(t_conv(y, state, f'{rpn}.objectness_logits'))

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

        y = mp_t
        for i in range(1, 5):
            y = F.relu(t_conv(y, state, f'roi_heads.mask_head.mask_fcn{i}',
                              pad=1))
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

    # ---- ours --------------------------------------------------------------
    def composed(self, images, boxes):
        feats = self._features(images)
        logits, _ = self.rpn_head(feats)
        bp = self._pool(feats, boxes, 7, train=True)
        mp = self._pool(feats, boxes, 14, train=True)
        n = boxes.shape[0] * boxes.shape[1]
        cls, _ = self.box_head(bp.reshape(n, 7, 7, -1))
        mask = self.mask_head(mp.reshape(n, 14, 14, -1))
        kp = self.keypoint_head(bp.reshape(n, 7, 7, -1))
        return feats, logits, cls, mask, kp

    with jax.default_matmul_precision('highest'):
        feats, logits, cls, mask, kp = model.apply(
            params, jnp.asarray(x), jnp.asarray(boxes), method=composed)

    # full-width accumulations are ~16-64x longer than the tiny test's;
    # tolerances scale with sqrt(width ratio)
    for lvl, (ours, theirs) in enumerate(zip(feats, pyramid_t)):
        np.testing.assert_allclose(
            np.asarray(ours, 'float32'), theirs.numpy().transpose(0, 2, 3, 1),
            atol=3e-3, err_msg=f'P{lvl + 2}')
    for lvl, (ours, theirs) in enumerate(zip(logits, rpn_obj_t)):
        np.testing.assert_allclose(
            np.asarray(ours, 'float32'), theirs.numpy().transpose(0, 2, 3, 1),
            atol=5e-3, err_msg=f'rpn objectness P{lvl + 2}')
    np.testing.assert_allclose(np.asarray(cls), cls_t.numpy(), atol=1e-2,
                               err_msg='box cls')
    np.testing.assert_allclose(
        np.asarray(mask)[..., 0], mask_t.numpy()[:, 0], atol=1e-2,
        err_msg='mask logits')
    np.testing.assert_allclose(
        np.asarray(kp), kp_t.numpy().transpose(0, 2, 3, 1), atol=1e-2,
        err_msg='keypoint logits')
