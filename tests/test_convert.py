'''Detectron2-checkpoint -> flax converter: golden-numerics parity vs torch.

Detectron2 itself is not installable here, so the oracle is a compact torch
reimplementation of the exact architecture Detectron2 builds for the
reference's config (keypoint_rcnn_R_50_FPN_3x + mask head,
/root/reference/moseq2_detectron_extract/model/config.py:30-56), weighted by
a randomly-initialized state dict using detectron2-native parameter names.
The converter maps that state dict onto our flax modules; outputs must agree
to float32 tolerance. This validates both the name/layout mapping AND that
our flax modules compute the same function as the torch/Detectron2 ops
(convs, FrozenBN, GN, deconvs, NHWC-vs-NCHW flatten, bilinear upsample).
'''
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from moseq2_detectron_extract_tpu.models.convert import (  # noqa: E402
    convert_detectron2_params, load_detectron2_state)
from moseq2_detectron_extract_tpu.models.fpn import FPN  # noqa: E402
from moseq2_detectron_extract_tpu.models.heads import (  # noqa: E402
    BoxHead, KeypointHead, MaskHead)
from moseq2_detectron_extract_tpu.models.resnet import ResNet  # noqa: E402
from moseq2_detectron_extract_tpu.models.rpn import RPNHead  # noqa: E402

RNG = np.random.default_rng(42)
EPS_BN = 1e-5


def _w(*shape, scale=0.1):
    return RNG.normal(0, scale, shape).astype('float32')


def _t(arr):
    return torch.tensor(np.ascontiguousarray(arr))


# ---------------------------------------------------------------------------
# torch-side reference ops with Detectron2 semantics
# ---------------------------------------------------------------------------

def t_conv(x, state, name, stride=1, pad=0):
    w = _t(state[f'{name}.weight'])
    b = _t(state[f'{name}.bias']) if f'{name}.bias' in state else None
    return F.conv2d(x, w, b, stride=stride, padding=pad)


def t_frozen_bn(x, state, name):
    w = _t(state[f'{name}.norm.weight'])
    b = _t(state[f'{name}.norm.bias'])
    mean = _t(state[f'{name}.norm.running_mean'])
    var = _t(state[f'{name}.norm.running_var'])
    scale = w / torch.sqrt(var + EPS_BN)
    return x * scale[None, :, None, None] + \
        (b - mean * scale)[None, :, None, None]


def t_gn(x, state, name):
    return F.group_norm(x, 32, _t(state[f'{name}.norm.weight']),
                        _t(state[f'{name}.norm.bias']), eps=1e-5)


def t_bottleneck(x, state, prefix, stride=1, has_shortcut=False):
    '''Detectron2 BottleneckBlock with stride_in_1x1=True (R50 default).'''
    if has_shortcut:
        shortcut = t_conv(x, state, f'{prefix}.shortcut', stride=stride)
        shortcut = t_frozen_bn(shortcut, state, f'{prefix}.shortcut')
    else:
        shortcut = x
    y = F.relu(t_frozen_bn(t_conv(x, state, f'{prefix}.conv1', stride=stride),
                           state, f'{prefix}.conv1'))
    y = F.relu(t_frozen_bn(t_conv(y, state, f'{prefix}.conv2', pad=1),
                           state, f'{prefix}.conv2'))
    y = t_frozen_bn(t_conv(y, state, f'{prefix}.conv3'), state, f'{prefix}.conv3')
    return F.relu(y + shortcut)


STAGE_BLOCKS = {2: 3, 3: 4, 4: 6, 5: 3}


def t_resnet50(x, state):
    stem = 'backbone.bottom_up.stem.conv1'
    y = F.relu(t_frozen_bn(t_conv(x, state, stem, stride=2, pad=3), state, stem))
    y = F.max_pool2d(y, 3, stride=2, padding=1)
    feats = {}
    for stage, nblocks in STAGE_BLOCKS.items():
        for block in range(nblocks):
            prefix = f'backbone.bottom_up.res{stage}.{block}'
            stride = 2 if (block == 0 and stage > 2) else 1
            y = t_bottleneck(y, state, prefix, stride=stride,
                             has_shortcut=(block == 0))
        feats[f'res{stage}'] = y
    return feats


def t_fpn(feats, state):
    laterals = []
    for level, name in zip((2, 3, 4, 5), ('res2', 'res3', 'res4', 'res5')):
        lat = t_conv(feats[name], state, f'backbone.fpn_lateral{level}')
        laterals.append(t_gn(lat, state, f'backbone.fpn_lateral{level}'))
    results = [laterals[-1]]
    for lat in laterals[-2::-1]:
        up = F.interpolate(results[0], scale_factor=2, mode='nearest')
        results.insert(0, (lat + up) / 2.0)   # FUSE_TYPE='avg'
    outs = []
    for level, feat in zip((2, 3, 4, 5), results):
        out = t_conv(feat, state, f'backbone.fpn_output{level}', pad=1)
        outs.append(t_gn(out, state, f'backbone.fpn_output{level}'))
    outs.append(F.max_pool2d(outs[-1], 1, stride=2))
    return outs  # P2..P6


def make_backbone_state(width=16, fpn_c=32):
    '''Random d2-named state dict for an R50-FPN (zoo shapes at width=64,
    fpn_c=256; narrow variants for fast tests).'''
    state = {}
    w = width

    def add_bn(prefix, c):
        state[f'{prefix}.norm.weight'] = _w(c) + 1.0
        state[f'{prefix}.norm.bias'] = _w(c)
        state[f'{prefix}.norm.running_mean'] = _w(c)
        state[f'{prefix}.norm.running_var'] = np.abs(_w(c)) + 0.5

    state['backbone.bottom_up.stem.conv1.weight'] = _w(w, 3, 7, 7)
    add_bn('backbone.bottom_up.stem.conv1', w)
    in_c = w
    for stage, nblocks in STAGE_BLOCKS.items():
        mid = w * 2 ** (stage - 2)
        out_c = mid * 4
        for block in range(nblocks):
            prefix = f'backbone.bottom_up.res{stage}.{block}'
            state[f'{prefix}.conv1.weight'] = _w(mid, in_c, 1, 1)
            add_bn(f'{prefix}.conv1', mid)
            state[f'{prefix}.conv2.weight'] = _w(mid, mid, 3, 3)
            add_bn(f'{prefix}.conv2', mid)
            state[f'{prefix}.conv3.weight'] = _w(out_c, mid, 1, 1)
            add_bn(f'{prefix}.conv3', out_c)
            if block == 0:
                state[f'{prefix}.shortcut.weight'] = _w(out_c, in_c, 1, 1)
                add_bn(f'{prefix}.shortcut', out_c)
            in_c = out_c
    # fpn_c must be a multiple of 32 for GN
    for level, c in zip((2, 3, 4, 5), (w * 4, w * 8, w * 16, w * 32)):
        state[f'backbone.fpn_lateral{level}.weight'] = _w(fpn_c, c, 1, 1)
        state[f'backbone.fpn_lateral{level}.norm.weight'] = _w(fpn_c) + 1.0
        state[f'backbone.fpn_lateral{level}.norm.bias'] = _w(fpn_c)
        state[f'backbone.fpn_output{level}.weight'] = _w(fpn_c, fpn_c, 3, 3)
        state[f'backbone.fpn_output{level}.norm.weight'] = _w(fpn_c) + 1.0
        state[f'backbone.fpn_output{level}.norm.bias'] = _w(fpn_c)
    return state


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestBackboneParity:
    def test_resnet_fpn_matches_torch(self):
        '''Whole backbone+FPN parity: converted weights reproduce the torch
        forward on random input (validates every transform + the name map).'''
        state = make_backbone_state(width=16)
        x = RNG.normal(0, 1, (1, 64, 64, 3)).astype('float32')

        feats_t = t_resnet50(_t(x.transpose(0, 3, 1, 2)), state)
        pyramid_t = t_fpn(feats_t, state)

        resnet = ResNet(depth=50, width=16)
        fpn = FPN(out_channels=32)
        with jax.default_matmul_precision('highest'):
            rp = resnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
            feats0 = resnet.apply(rp, jnp.asarray(x))
            fp = fpn.init(jax.random.PRNGKey(1), feats0)

            template = {'params': {'backbone': rp['params'],
                                   'fpn': fp['params']}}
            params, report = convert_detectron2_params(state, template)
            assert not report['shape_mismatch'], report['shape_mismatch']
            assert not report['unused'], report['unused'][:10]

            feats = resnet.apply({'params': params['params']['backbone']},
                                 jnp.asarray(x))
            pyramid = fpn.apply({'params': params['params']['fpn']}, feats)

        for level, (ours, theirs) in enumerate(zip(pyramid, pyramid_t)):
            ref = theirs.numpy().transpose(0, 2, 3, 1)
            got = np.asarray(ours)
            assert got.shape == ref.shape, (level, got.shape, ref.shape)
            np.testing.assert_allclose(got, ref, atol=2e-4,
                                       err_msg=f'P{level + 2} mismatch')

    def test_caffe2_names_accepted(self):
        '''MSRA/Caffe2 ImageNet pkl names map to the same tree (fused BN ->
        affine with identity running stats).'''
        from moseq2_detectron_extract_tpu.models.convert import \
            _convert_caffe2_names
        state = {
            'conv1_w': _w(16, 3, 7, 7),
            'res_conv1_bn_s': _w(16) + 1, 'res_conv1_bn_b': _w(16),
            'res2_0_branch2a_w': _w(16, 16, 1, 1),
            'res2_0_branch2a_bn_s': _w(16) + 1, 'res2_0_branch2a_bn_b': _w(16),
            'res2_0_branch1_w': _w(64, 16, 1, 1),
            'res2_0_branch1_bn_s': _w(64) + 1, 'res2_0_branch1_bn_b': _w(64),
        }
        out = _convert_caffe2_names(state)
        assert 'backbone.bottom_up.stem.conv1.weight' in out
        assert 'backbone.bottom_up.res2.0.conv1.norm.running_var' in out
        np.testing.assert_array_equal(
            out['backbone.bottom_up.res2.0.shortcut.norm.running_mean'],
            np.zeros(64, 'float32'))


class TestHeadParity:
    def test_box_head_matches_torch(self):
        '''FastRCNNConvFCHead + predictors: the fc1 NCHW->NHWC flatten
        permutation is the subtle part.'''
        c, s = 256, 7
        state = {
            'roi_heads.box_head.fc1.weight': _w(64, c * s * s, scale=0.02),
            'roi_heads.box_head.fc1.bias': _w(64),
            'roi_heads.box_head.fc2.weight': _w(64, 64),
            'roi_heads.box_head.fc2.bias': _w(64),
            'roi_heads.box_predictor.cls_score.weight': _w(2, 64),
            'roi_heads.box_predictor.cls_score.bias': _w(2),
            'roi_heads.box_predictor.bbox_pred.weight': _w(4, 64),
            'roi_heads.box_predictor.bbox_pred.bias': _w(4),
        }
        x = RNG.normal(0, 1, (3, s, s, c)).astype('float32')

        xt = _t(x.transpose(0, 3, 1, 2)).flatten(1)
        h = F.relu(F.linear(xt, _t(state['roi_heads.box_head.fc1.weight']),
                            _t(state['roi_heads.box_head.fc1.bias'])))
        h = F.relu(F.linear(h, _t(state['roi_heads.box_head.fc2.weight']),
                            _t(state['roi_heads.box_head.fc2.bias'])))
        cls_t = F.linear(h, _t(state['roi_heads.box_predictor.cls_score.weight']),
                         _t(state['roi_heads.box_predictor.cls_score.bias']))
        box_t = F.linear(h, _t(state['roi_heads.box_predictor.bbox_pred.weight']),
                         _t(state['roi_heads.box_predictor.bbox_pred.bias']))

        head = BoxHead(num_classes=1, fc_dim=64)
        with jax.default_matmul_precision('highest'):
            template = {'params': {'box_head': head.init(
                jax.random.PRNGKey(0), jnp.asarray(x))['params']}}
            params, report = convert_detectron2_params(state, template)
            assert not report['shape_mismatch'], report['shape_mismatch']
            cls, box = head.apply({'params': params['params']['box_head']},
                                  jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(cls), cls_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(box), box_t.numpy(), atol=1e-4)

    def test_mask_head_matches_torch(self):
        state = {}
        for i in range(1, 5):
            state[f'roi_heads.mask_head.mask_fcn{i}.weight'] = _w(32, 32, 3, 3)
            state[f'roi_heads.mask_head.mask_fcn{i}.bias'] = _w(32)
        state['roi_heads.mask_head.deconv.weight'] = _w(32, 32, 2, 2)
        state['roi_heads.mask_head.deconv.bias'] = _w(32)
        state['roi_heads.mask_head.predictor.weight'] = _w(1, 32, 1, 1)
        state['roi_heads.mask_head.predictor.bias'] = _w(1)

        x = RNG.normal(0, 1, (2, 14, 14, 32)).astype('float32')
        y = _t(x.transpose(0, 3, 1, 2))
        for i in range(1, 5):
            y = F.relu(t_conv(y, state, f'roi_heads.mask_head.mask_fcn{i}', pad=1))
        y = F.relu(F.conv_transpose2d(
            y, _t(state['roi_heads.mask_head.deconv.weight']),
            _t(state['roi_heads.mask_head.deconv.bias']), stride=2))
        ref = t_conv(y, state, 'roi_heads.mask_head.predictor') \
            .numpy().transpose(0, 2, 3, 1)

        head = MaskHead(num_classes=1, conv_dims=(32,) * 4)
        with jax.default_matmul_precision('highest'):
            template = {'params': {'mask_head': head.init(
                jax.random.PRNGKey(0), jnp.asarray(x))['params']}}
            params, report = convert_detectron2_params(state, template)
            assert not report['shape_mismatch'], report['shape_mismatch']
            got = head.apply({'params': params['params']['mask_head']},
                             jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    def test_keypoint_head_matches_torch(self):
        '''KRCNNConvDeconvUpsampleHead: 8 convs + deconv(4,2,1) + bilinear
        2x interp (align_corners=False).'''
        nk = 8
        state = {}
        cin = 32
        for i in range(1, 9):
            state[f'roi_heads.keypoint_head.conv_fcn{i}.weight'] = \
                _w(32, cin, 3, 3)
            state[f'roi_heads.keypoint_head.conv_fcn{i}.bias'] = _w(32)
            cin = 32
        state['roi_heads.keypoint_head.score_lowres.weight'] = _w(32, nk, 4, 4)
        state['roi_heads.keypoint_head.score_lowres.bias'] = _w(nk)

        x = RNG.normal(0, 1, (2, 7, 7, 32)).astype('float32')
        y = _t(x.transpose(0, 3, 1, 2))
        for i in range(1, 9):
            y = F.relu(t_conv(y, state, f'roi_heads.keypoint_head.conv_fcn{i}',
                              pad=1))
        y = F.conv_transpose2d(
            y, _t(state['roi_heads.keypoint_head.score_lowres.weight']),
            _t(state['roi_heads.keypoint_head.score_lowres.bias']),
            stride=2, padding=1)
        ref = F.interpolate(y, scale_factor=2, mode='bilinear',
                            align_corners=False).numpy().transpose(0, 2, 3, 1)

        head = KeypointHead(num_keypoints=nk, conv_dims=(32,) * 8)
        with jax.default_matmul_precision('highest'):
            template = {'params': {'keypoint_head': head.init(
                jax.random.PRNGKey(0), jnp.asarray(x))['params']}}
            params, report = convert_detectron2_params(state, template)
            assert not report['shape_mismatch'], report['shape_mismatch']
            got = head.apply({'params': params['params']['keypoint_head']},
                             jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    def test_rpn_head_matches_torch(self):
        state = {
            'proposal_generator.rpn_head.conv.weight': _w(32, 32, 3, 3),
            'proposal_generator.rpn_head.conv.bias': _w(32),
            'proposal_generator.rpn_head.objectness_logits.weight': _w(3, 32, 1, 1),
            'proposal_generator.rpn_head.objectness_logits.bias': _w(3),
            'proposal_generator.rpn_head.anchor_deltas.weight': _w(12, 32, 1, 1),
            'proposal_generator.rpn_head.anchor_deltas.bias': _w(12),
        }
        x = RNG.normal(0, 1, (1, 16, 16, 32)).astype('float32')
        y = F.relu(t_conv(_t(x.transpose(0, 3, 1, 2)), state,
                          'proposal_generator.rpn_head.conv', pad=1))
        obj_t = t_conv(y, state, 'proposal_generator.rpn_head.objectness_logits')
        del_t = t_conv(y, state, 'proposal_generator.rpn_head.anchor_deltas')

        head = RPNHead(num_anchors=3, conv_dim=32)
        with jax.default_matmul_precision('highest'):
            template = {'params': {'rpn_head': head.init(
                jax.random.PRNGKey(0), [jnp.asarray(x)])['params']}}
            params, report = convert_detectron2_params(state, template)
            assert not report['shape_mismatch'], report['shape_mismatch']
            (obj,), (dlt,) = head.apply({'params': params['params']['rpn_head']},
                                        [jnp.asarray(x)])
        np.testing.assert_allclose(
            np.asarray(obj), obj_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(dlt), del_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)


class TestCheckpointIO:
    def test_pkl_and_pth_round_trip(self, tmp_path):
        '''Both zoo formats load to the same flat numpy dict.'''
        import pickle
        state = {'backbone.fpn_lateral2.weight': _w(8, 4, 1, 1),
                 'roi_heads.box_head.fc1.bias': _w(8)}
        pkl = tmp_path / 'model.pkl'
        with open(pkl, 'wb') as fh:
            pickle.dump({'model': state, '__author__': 'zoo'}, fh)
        loaded = load_detectron2_state(str(pkl))
        assert set(loaded) == set(state)

        pth = tmp_path / 'model.pth'
        torch.save({'model': {k: torch.tensor(v) for k, v in state.items()}},
                   str(pth))
        loaded2 = load_detectron2_state(str(pth))
        np.testing.assert_array_equal(
            loaded2['roi_heads.box_head.fc1.bias'],
            state['roi_heads.box_head.fc1.bias'])

    def test_shape_mismatch_keeps_template(self):
        '''The zoo model's 17-keypoint score_lowres must be skipped for our
        8-keypoint head (DetectionCheckpointer skip-with-warning parity).'''
        nk = 8
        head = KeypointHead(num_keypoints=nk, conv_dims=(32,) * 8)
        x = jnp.zeros((1, 7, 7, 32), jnp.float32)
        template = {'params': {'keypoint_head': head.init(
            jax.random.PRNGKey(0), x)['params']}}
        before = np.asarray(
            template['params']['keypoint_head']['score_lowres']['kernel']).copy()
        state = {'roi_heads.keypoint_head.score_lowres.weight': _w(32, 17, 4, 4),
                 'roi_heads.keypoint_head.score_lowres.bias': _w(17)}
        params, report = convert_detectron2_params(state, template)
        assert len(report['shape_mismatch']) == 2
        np.testing.assert_array_equal(
            np.asarray(params['params']['keypoint_head']['score_lowres']['kernel']),
            before)
