'''Unskipped train-to-AP guard (VERDICT r1 item 4).

Evaluates a committed checkpoint — trained end-to-end by
``TINY=1 NO_AUG=1 python benchmarks/overfit_ap.py`` on a TPU chip
(AP50 100/100/100 at save time, APREPORT.md) — through the production
Predictor + COCOeval-semantics evaluator, asserting AP50 > 90 for bbox,
segm and keypoints on the training set it memorized.

This permanently guards the whole train->infer->eval contract on CPU:
a silent train/inference mismatch (wrong normalization, proposal layout,
heatmap decode, score handling, ...) drops these APs far below 90 even
though the checkpoint itself is fixed. Both training-path bugs found this
round (frozen-BN leak, undetached proposals) would have been caught by a
regenerated version of this fixture failing to reach target.

Reference AP delegation point: m2de/model/eval.py:23-162.
'''
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'benchmarks'))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'data')


def load_committed_params():
    flat = np.load(os.path.join(DATA_DIR, 'tiny_overfit_params.npz'))
    tree = {}
    for key in flat.files:
        node = tree
        parts = key.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jax.numpy.asarray(flat[key].astype(np.float32))
    return tree


@pytest.fixture(scope='module')
def trained():
    os.environ['TINY'] = '1'
    from overfit_ap import build_config, make_items, make_mouse_dataset
    from moseq2_detectron_extract_tpu.models.config import ModelConfig
    cfg = ModelConfig.from_yaml(os.path.join(DATA_DIR,
                                             'tiny_overfit_config.yaml'))
    # the committed config must match the generator's tiny config (same
    # canvas + keypoints); dataset is regenerated from the fixed seed
    rng = np.random.default_rng(0)
    data = make_mouse_dataset(rng, 24, cfg.image_size, cfg.num_keypoints)
    return cfg, load_committed_params(), data, make_items(data)


class TestCommittedOverfitCheckpoint:
    def test_ap50_above_90_on_training_set(self, trained):
        from moseq2_detectron_extract_tpu.models.eval import evaluate_predictions
        from moseq2_detectron_extract_tpu.models.predictor import Predictor
        cfg, params, data, items = trained
        predictor = Predictor(cfg, params, batch_size=8, score_threshold=0.5)
        out = predictor(np.clip(data['image'], 0, 255).astype('uint8'))
        preds = [{k: v[i] for k, v in out.items()} for i in range(len(items))]
        res = evaluate_predictions(items, preds, cfg.oks_sigmas)
        for task in ('bbox', 'segm', 'keypoints'):
            assert res[task]['AP50'] > 90.0, \
                f'{task} AP50 = {res[task]["AP50"]:.2f} (committed overfit ' \
                f'checkpoint should score >90; train/infer path broken?)'
