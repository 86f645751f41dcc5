'''Detectron2 checkpoint -> flax parameter converter.

The reference initializes training from the COCO-pretrained
``keypoint_rcnn_R_50_FPN_3x`` zoo checkpoint
(/root/reference/moseq2_detectron_extract/model/config.py:30-35) and resumes
user checkpoints via DetectionCheckpointer
(/root/reference/moseq2_detectron_extract/model/util.py:15-42). This module
maps those checkpoint formats onto :class:`MaskKeypointRCNN`'s parameter tree
so pretrained backbones transfer:

* ``.pkl``  — Detectron2 zoo format: a pickle of ``{'model': {name: ndarray}}``
  with detectron2-native names, or Caffe2/MSRA names for ImageNet backbones.
* ``.pth``  — torch ``state_dict`` (possibly nested under ``'model'``).

Layout transforms (verified against torch CPU in tests/test_convert.py):

* Conv2d           OIHW             -> flax HWIO: ``transpose(2, 3, 1, 0)``
* Linear           (out, in)        -> flax (in, out): ``T``
* first box FC     (out, C*S*S)     -> NHWC flatten order: reshape to
                                       (out, C, S, S), ``transpose(2, 3, 1, 0)``,
                                       reshape to (S*S*C, out)
* ConvTranspose2d  (in, out, kh, kw) -> flax ConvTranspose kernel
                                       (kh, kw, in, out) with the spatial taps
                                       FLIPPED: ``w[:, :, ::-1, ::-1]``
                                       ``.transpose(2, 3, 0, 1)`` (flax's
                                       lax.conv_transpose does not mirror the
                                       kernel; torch's deconv is the gradient
                                       of conv, which does)
* FrozenBN         weight/bias/running_mean/running_var -> scale/bias/mean/var

Shape-mismatched leaves (e.g. the zoo model's 17-keypoint ``score_lowres``
vs our 8, or its person-class ``cls_score``) keep their template init and are
reported, mirroring DetectionCheckpointer's skip-with-warning behavior.
'''
import logging
import pickle
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# checkpoint readers
# --------------------------------------------------------------------------

def load_detectron2_state(path: str) -> Dict[str, np.ndarray]:
    '''Read a Detectron2 ``.pkl`` or torch ``.pth`` checkpoint into a flat
    ``{name: float ndarray}`` dict with detectron2-native names.'''
    if path.endswith('.pkl'):
        with open(path, 'rb') as fh:
            data = pickle.load(fh, encoding='latin1')
    else:
        import torch
        data = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(data, dict) and 'model' in data:
        data = data['model']
    state: Dict[str, np.ndarray] = {}
    for name, value in data.items():
        if hasattr(value, 'detach'):        # torch tensor
            value = value.detach().cpu().numpy()
        arr = np.asarray(value)
        if arr.dtype == object or not np.issubdtype(arr.dtype, np.number):
            continue
        state[name] = arr.astype(np.float32)
    if _looks_caffe2(state):
        state = _convert_caffe2_names(state)
    return state


def _looks_caffe2(state: Dict[str, np.ndarray]) -> bool:
    return any(re.match(r'res\d+_\d+_branch', k) for k in state) or \
        'conv1_w' in state


def _convert_caffe2_names(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    '''MSRA/Caffe2 ImageNet backbone names -> detectron2 names.

    Caffe2 BN is pre-fused into an affine transform (``_bn_s``/``_bn_b``
    only); synthesize identity running stats so FrozenBN reproduces the same
    affine map.
    '''
    out: Dict[str, np.ndarray] = {}
    branch_to_conv = {'branch2a': 'conv1', 'branch2b': 'conv2',
                      'branch2c': 'conv3', 'branch1': 'shortcut'}

    def put_bn(prefix: str, scale: np.ndarray, bias: np.ndarray):
        out[f'{prefix}.norm.weight'] = scale
        out[f'{prefix}.norm.bias'] = bias
        out[f'{prefix}.norm.running_mean'] = np.zeros_like(scale)
        out[f'{prefix}.norm.running_var'] = np.ones_like(scale)

    stem = 'backbone.bottom_up.stem.conv1'
    if 'conv1_w' in state:
        out[f'{stem}.weight'] = state['conv1_w']
        put_bn(stem, state['res_conv1_bn_s'], state['res_conv1_bn_b'])

    for key, value in state.items():
        m = re.match(r'res(\d+)_(\d+)_(branch\w+)_(w|bn_s|bn_b)$', key)
        if not m:
            continue
        stage, block, branch, kind = m.groups()
        conv = branch_to_conv[branch]
        prefix = f'backbone.bottom_up.res{stage}.{block}.{conv}'
        if kind == 'w':
            out[f'{prefix}.weight'] = value
        elif kind == 'bn_s':
            put_bn(prefix, value, state[key[:-1] + 'b'])
    return out


# --------------------------------------------------------------------------
# name mapping: detectron2 -> flax path
# --------------------------------------------------------------------------

_BN_FIELDS = {'weight': 'scale', 'bias': 'bias',
              'running_mean': 'mean', 'running_var': 'var'}


def _backbone_entries() -> List[Tuple[str, Tuple[str, ...], str]]:
    '''(d2 name, flax path, transform) for the R50 backbone + FPN.'''
    entries: List[Tuple[str, Tuple[str, ...], str]] = []
    stem = 'backbone.bottom_up.stem.conv1'
    entries.append((f'{stem}.weight', ('backbone', 'stem_conv', 'kernel'), 'conv'))
    for field, ours in _BN_FIELDS.items():
        entries.append((f'{stem}.norm.{field}',
                        ('backbone', 'FrozenBatchNorm_0', ours), 'none'))

    stage_blocks = {2: 3, 3: 4, 4: 6, 5: 3}
    for stage, nblocks in stage_blocks.items():
        for block in range(nblocks):
            d2 = f'backbone.bottom_up.res{stage}.{block}'
            ours_mod = f'res{stage}_{block}'
            has_shortcut = block == 0
            # flax FrozenBatchNorm auto-numbering: shortcut norm is declared
            # first (models/resnet.py Bottleneck), then conv1..conv3 norms
            norm_index = {'shortcut': 0} if has_shortcut else {}
            base = 1 if has_shortcut else 0
            for i, conv in enumerate(('conv1', 'conv2', 'conv3')):
                norm_index[conv] = base + i
            convs = ['conv1', 'conv2', 'conv3'] + (['shortcut'] if has_shortcut else [])
            for conv in convs:
                entries.append((f'{d2}.{conv}.weight',
                                ('backbone', ours_mod, conv, 'kernel'), 'conv'))
                for field, ours in _BN_FIELDS.items():
                    entries.append((
                        f'{d2}.{conv}.norm.{field}',
                        ('backbone', ours_mod,
                         f'FrozenBatchNorm_{norm_index[conv]}', ours), 'none'))

    for level in (2, 3, 4, 5):
        entries.append((f'backbone.fpn_lateral{level}.weight',
                        ('fpn', f'lateral{level}', 'kernel'), 'conv'))
        entries.append((f'backbone.fpn_output{level}.weight',
                        ('fpn', f'output{level}', 'kernel'), 'conv'))
        for kind in ('lateral', 'output'):
            entries.append((f'backbone.fpn_{kind}{level}.norm.weight',
                            ('fpn', f'{kind}_norm{level}', 'scale'), 'none'))
            entries.append((f'backbone.fpn_{kind}{level}.norm.bias',
                            ('fpn', f'{kind}_norm{level}', 'bias'), 'none'))
            # un-normed FPN variants carry conv biases instead
            entries.append((f'backbone.fpn_{kind}{level}.bias',
                            ('fpn', f'{kind}{level}', 'bias'), 'none'))
    return entries


def _head_entries() -> List[Tuple[str, Tuple[str, ...], str]]:
    entries: List[Tuple[str, Tuple[str, ...], str]] = []

    rpn = 'proposal_generator.rpn_head'
    for d2, ours in (('conv', 'conv'), ('objectness_logits', 'objectness'),
                     ('anchor_deltas', 'deltas')):
        entries.append((f'{rpn}.{d2}.weight', ('rpn_head', ours, 'kernel'), 'conv'))
        entries.append((f'{rpn}.{d2}.bias', ('rpn_head', ours, 'bias'), 'none'))

    entries.append(('roi_heads.box_head.fc1.weight',
                    ('box_head', 'fc1', 'kernel'), 'fc_from_conv'))
    entries.append(('roi_heads.box_head.fc1.bias',
                    ('box_head', 'fc1', 'bias'), 'none'))
    entries.append(('roi_heads.box_head.fc2.weight',
                    ('box_head', 'fc2', 'kernel'), 'linear'))
    entries.append(('roi_heads.box_head.fc2.bias',
                    ('box_head', 'fc2', 'bias'), 'none'))
    for d2, ours in (('cls_score', 'cls_score'), ('bbox_pred', 'bbox_pred')):
        entries.append((f'roi_heads.box_predictor.{d2}.weight',
                        ('box_head', ours, 'kernel'), 'linear'))
        entries.append((f'roi_heads.box_predictor.{d2}.bias',
                        ('box_head', ours, 'bias'), 'none'))

    for i in range(1, 5):
        entries.append((f'roi_heads.mask_head.mask_fcn{i}.weight',
                        ('mask_head', f'mask_fcn{i}', 'kernel'), 'conv'))
        entries.append((f'roi_heads.mask_head.mask_fcn{i}.bias',
                        ('mask_head', f'mask_fcn{i}', 'bias'), 'none'))
    entries.append(('roi_heads.mask_head.deconv.weight',
                    ('mask_head', 'deconv', 'kernel'), 'deconv'))
    entries.append(('roi_heads.mask_head.deconv.bias',
                    ('mask_head', 'deconv', 'bias'), 'none'))
    entries.append(('roi_heads.mask_head.predictor.weight',
                    ('mask_head', 'predictor', 'kernel'), 'conv'))
    entries.append(('roi_heads.mask_head.predictor.bias',
                    ('mask_head', 'predictor', 'bias'), 'none'))

    for i in range(1, 9):
        entries.append((f'roi_heads.keypoint_head.conv_fcn{i}.weight',
                        ('keypoint_head', f'conv_fcn{i}', 'kernel'), 'conv'))
        entries.append((f'roi_heads.keypoint_head.conv_fcn{i}.bias',
                        ('keypoint_head', f'conv_fcn{i}', 'bias'), 'none'))
    entries.append(('roi_heads.keypoint_head.score_lowres.weight',
                    ('keypoint_head', 'score_lowres', 'kernel'), 'deconv'))
    entries.append(('roi_heads.keypoint_head.score_lowres.bias',
                    ('keypoint_head', 'score_lowres', 'bias'), 'none'))
    return entries


def detectron2_name_map() -> List[Tuple[str, Tuple[str, ...], str]]:
    '''Full (d2 name, flax path under params, transform) table.'''
    return _backbone_entries() + _head_entries()


# --------------------------------------------------------------------------
# transforms
# --------------------------------------------------------------------------

def _apply_transform(value: np.ndarray, transform: str) -> np.ndarray:
    if transform == 'none':
        return value
    if transform == 'conv':            # OIHW -> HWIO
        return value.transpose(2, 3, 1, 0)
    if transform == 'linear':          # (out, in) -> (in, out)
        return value.T
    if transform == 'deconv':          # (in, out, kh, kw) -> (kh, kw, in, out), flipped
        return value[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    if transform == 'fc_from_conv':    # (out, C*S*S) NCHW-flat -> NHWC-flat (in, out)
        out_dim, in_flat = value.shape
        # the pooled feature is (S, S, C); the box pooler is 7x7 across the
        # whole Detectron2 R-CNN family, so infer C from S=7 first and only
        # fall back to the zoo C=256 for exotic flat sizes
        for size in (7, 14):
            if in_flat % (size * size) == 0:
                channels = in_flat // (size * size)
                break
        else:
            channels = 256
            size = int(round((in_flat / channels) ** 0.5))
        if size * size * channels != in_flat:
            raise ValueError(f'cannot infer pooler shape from fc ({value.shape})')
        return value.reshape(out_dim, channels, size, size) \
            .transpose(2, 3, 1, 0).reshape(in_flat, out_dim)
    raise ValueError(f'unknown transform {transform}')


# --------------------------------------------------------------------------
# conversion
# --------------------------------------------------------------------------

def convert_detectron2_params(state: Dict[str, np.ndarray], template: Any
                              ) -> Tuple[Any, Dict[str, List[str]]]:
    '''Map a d2 state dict onto a flax params template.

    Returns ``(params, report)`` where ``report`` lists ``loaded``,
    ``shape_mismatch`` (kept template init), and ``unused`` d2 keys.
    '''
    import jax

    params = jax.tree_util.tree_map(np.asarray, template)
    root = params['params'] if isinstance(params, dict) and 'params' in params \
        else params

    report: Dict[str, List[str]] = {'loaded': [], 'shape_mismatch': [],
                                    'missing_in_source': [], 'unused': []}
    used = set()
    for d2_name, path, transform in detectron2_name_map():
        node = root
        ok = True
        for key in path[:-1]:
            if not isinstance(node, dict) or key not in node:
                ok = False
                break
            node = node[key]
        if not ok or path[-1] not in node:
            # leaf absent from this model variant (e.g. unused fpn conv bias)
            if d2_name in state:
                used.add(d2_name)   # present in source but our model lacks it
            continue
        if d2_name not in state:
            report['missing_in_source'].append(d2_name)
            continue
        used.add(d2_name)
        value = _apply_transform(state[d2_name], transform)
        target = node[path[-1]]
        if tuple(value.shape) != tuple(np.shape(target)):
            report['shape_mismatch'].append(
                f'{d2_name}: source {tuple(value.shape)} vs model '
                f'{tuple(np.shape(target))}')
            continue
        node[path[-1]] = value.astype(np.asarray(target).dtype)
        report['loaded'].append(d2_name)

    report['unused'] = sorted(
        k for k in state
        if k not in used and not k.startswith(('pixel_', 'anchor_generator')))
    return params, report


def convert_checkpoint(src_path: str, template: Any) -> Tuple[Any, Dict[str, List[str]]]:
    '''Load ``src_path`` (d2 .pkl/.pth) and map it onto ``template``.'''
    state = load_detectron2_state(src_path)
    params, report = convert_detectron2_params(state, template)
    logger.info('converted %s: %d loaded, %d shape-mismatched (kept init), '
                '%d missing, %d unused source keys', src_path,
                len(report['loaded']), len(report['shape_mismatch']),
                len(report['missing_in_source']), len(report['unused']))
    for line in report['shape_mismatch']:
        logger.info('  shape mismatch (kept init): %s', line)
    return params, report
