'''Deploy-path tests: jax.export serialize/deserialize round-trip, exported
program execution through the Predictor, and post-export evaluation — the
TPU analog of the reference's TorchScript export + optional post-export COCO
eval (m2de/model/deploy.py:24-123, m2de/cli.py:664-676).'''
import os

import numpy as np
import pytest

import jax

from moseq2_detectron_extract_tpu.models.checkpoint import save_checkpoint
from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.deploy import (export_model,
                                                        load_exported_model)
from moseq2_detectron_extract_tpu.models.predictor import Predictor
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN


def tiny_config(**overrides):
    base = dict(
        image_size=64,
        resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16, fpn_channels=64,
        box_fc_dim=128, mask_conv_dims=(64, 64), keypoint_conv_dims=(64, 64),
        rpn_pre_nms_topk_train=64, rpn_pre_nms_topk_test=64,
        rpn_post_nms_topk_train=64, rpn_post_nms_topk_test=32,
        roi_batch_size_per_image=16, test_detections_per_image=2,
        max_gt_instances=2,
    )
    base.update(overrides)
    return ModelConfig(**base)


@pytest.fixture(scope='module')
def model_dir(tmp_path_factory):
    '''A tiny trained-shaped model dir: config.yaml + orbax checkpoint.'''
    import jax.numpy as jnp
    d = str(tmp_path_factory.mktemp('deploy_model'))
    cfg = tiny_config()
    model = MaskKeypointRCNN(cfg)
    images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images,
                        method=MaskKeypointRCNN.inference)
    cfg.to_yaml(os.path.join(d, 'config.yaml'))
    save_checkpoint(d, 7, {'params': params, 'step': 7})
    return d


@pytest.fixture(scope='module')
def export_dir(model_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp('deploy_export'))
    return export_model(model_dir, output=out, batch_size=2)


def _frames(n=2, size=48, seed=3):
    return np.random.default_rng(seed).integers(
        0, 80, (n, size, size), dtype=np.uint8)


class TestExportRoundTrip:
    def test_export_writes_artifact(self, export_dir):
        hlo = os.path.join(export_dir, 'model.hlo')
        assert os.path.getsize(hlo) > 1000
        assert os.path.exists(os.path.join(export_dir, 'config.yaml'))

    def test_exported_program_is_used_and_matches_live(self, model_dir,
                                                       export_dir):
        exported = load_exported_model(export_dir)   # default = export batch
        assert exported.batch_size == 2
        assert exported._exported_forward is not None
        live = Predictor.from_model_dir(model_dir, batch_size=2)
        assert live._exported_forward is None

        frames = _frames()
        out_e = exported(frames)
        out_l = live(frames)
        assert set(out_e) == set(out_l)
        np.testing.assert_array_equal(out_e['valid'], out_l['valid'])
        np.testing.assert_array_equal(out_e['masks'], out_l['masks'])
        for key in ('boxes', 'scores', 'keypoints'):
            np.testing.assert_allclose(out_e[key], out_l[key],
                                       rtol=1e-5, atol=1e-5)

    def test_batch_mismatch_falls_back_to_retrace(self, export_dir):
        predictor = load_exported_model(export_dir, batch_size=3)
        assert predictor._exported_forward is None
        out = predictor(_frames(n=3))
        assert out['masks'].shape[0] == 3

    def test_post_export_eval_matches_live_model(self, model_dir, export_dir,
                                                 tmp_path):
        '''The reference optionally COCO-evals the exported artifact
        (m2de/model/deploy.py:24-123); exported and live models must yield
        identical metric dicts.'''
        import cv2
        from moseq2_detectron_extract_tpu.models.eval import evaluate_model

        rng = np.random.default_rng(11)
        items = []
        for i in range(3):
            img = np.zeros((48, 48), np.uint8)
            cv2.ellipse(img, (24, 24), (12, 6), 30.0 * i, 0, 360, 60, -1)
            img = np.clip(img + rng.normal(0, 2, img.shape), 0, 255
                          ).astype(np.uint8)
            path = str(tmp_path / f'im{i}.png')
            cv2.imwrite(path, img)
            mask = img > 30
            ys, xs = np.where(mask)
            kp = np.zeros((8, 3), 'float32')
            kp[:, 0] = np.linspace(xs.min() + 2, xs.max() - 2, 8)
            kp[:, 1] = 24.0
            kp[:, 2] = 2.0
            items.append({
                'height': 48, 'width': 48, 'file_name': path,
                'annotations': [{
                    'bbox': [float(xs.min()), float(ys.min()),
                             float(xs.max() + 1), float(ys.max() + 1)],
                    'segmentation': mask,
                    'keypoints': kp.ravel().tolist(),
                }],
            })

        res_live = evaluate_model(model_dir, items, batch_size=2)
        res_exp = evaluate_model(export_dir, items,
                                 predictor=load_exported_model(export_dir))
        assert set(res_live) == set(res_exp)
        for task in res_live:
            for metric, val in res_live[task].items():
                got = res_exp[task][metric]
                assert got == pytest.approx(val, abs=1e-6, nan_ok=True), \
                    f'{task}/{metric}: exported {got} != live {val}'


class TestNpzModelDir:
    '''The compact committed-artifact layout (params_f16.npz + config.yaml)
    loads through the same load_model_dir/Predictor interface as orbax dirs
    — the committed benchmark checkpoint (benchmarks/bench_model) rides on
    this path.'''

    def test_npz_round_trip_and_predictor_load(self, tmp_path):
        import jax.numpy as jnp
        from moseq2_detectron_extract_tpu.models.checkpoint import (
            load_model_dir, load_params_npz, save_params_npz)

        cfg = tiny_config()
        model = MaskKeypointRCNN(cfg)
        images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images,
                            method=MaskKeypointRCNN.inference)
        d = str(tmp_path / 'npz_model')
        os.makedirs(d)
        cfg.to_yaml(os.path.join(d, 'config.yaml'))
        save_params_npz(os.path.join(d, 'params_f16.npz'), params)

        restored = load_params_npz(os.path.join(d, 'params_f16.npz'))
        orig = jax.tree_util.tree_leaves(params)
        back = jax.tree_util.tree_leaves(restored)
        assert len(orig) == len(back)
        for a, b in zip(orig, back):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a, 'float32'), b,
                                       rtol=2e-3, atol=1e-4)

        cfg2, params2, _ = load_model_dir(d)
        assert cfg2.image_size == cfg.image_size
        predictor = Predictor(cfg2, params2, batch_size=2)
        out = predictor(_frames())
        assert out['masks'].shape[0] == 2

    def test_committed_bench_model_loads(self):
        '''The actual committed artifact must stay loadable.'''
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = os.path.join(repo, 'benchmarks', 'bench_model')
        if not os.path.exists(os.path.join(d, 'params_f16.npz')):
            pytest.skip('no committed bench model')
        from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
        cfg, params, _ = load_model_dir(d)
        import jax.numpy as jnp
        leaves = jax.tree_util.tree_leaves(params)
        assert leaves and all(np.isfinite(l).all() for l in leaves)
        assert cfg.image_size == 256

    @pytest.mark.parametrize('name,canvas,topk,cap', [
        ('bench_model_fast', 192, 32, 128),  # PROPOSAL_AB Run E shipping budget
        ('bench_model_fast160', 160, 16, 64),  # PROPOSAL_AB Run D shipping budget
    ])
    def test_committed_fast_variant_loads(self, name, canvas, topk, cap):
        '''The fast-variant artifacts (trained + AP-gated on chip,
        benchmarks/FAST_VARIANT.md) must stay loadable with their
        deployment configs intact.'''
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = os.path.join(repo, 'benchmarks', name)
        if not os.path.exists(os.path.join(d, 'params_f16.npz')):
            pytest.skip(f'no committed {name}')
        from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
        cfg, params, _ = load_model_dir(d)
        leaves = jax.tree_util.tree_leaves(params)
        assert leaves and all(np.isfinite(l).all() for l in leaves)
        assert cfg.image_size == canvas
        assert cfg.rpn_post_nms_topk_test == topk
        assert cfg.rpn_nms_global_cap == cap
        # the fast pyramids stack to an unaligned h_total (90 / 75) — keep
        # the kernel's padding contract visible here
        assert sum(cfg.image_size // (4 * 2 ** l) for l in range(4)) % 8 != 0
