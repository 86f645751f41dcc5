'''Slope-timed proposal-stage cost of the per-level pre-NMS clamp.

level_k_clamp_ab.py proved bit-identity but its Predictor round-trip fps
is tunnel-RTT-dominated (its own caveat). This times ONLY the
backbone→proposal prefix with the slope method (device_attrib.py's
timed_device_loop — fixed costs cancel exactly), clamped vs unclamped, at
the deployed faithful budget.

Run on the chip: python benchmarks/clamp_stage_timing.py
'''
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from benchmarks.device_attrib import timed_device_loop
    from moseq2_detectron_extract_tpu.models import rpn
    from moseq2_detectron_extract_tpu.models.config import ModelConfig
    from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN

    cfg = ModelConfig(test_detections_per_image=1,
                      rpn_post_nms_topk_test=128, rpn_nms_global_cap=512)
    model = MaskKeypointRCNN(cfg)
    b = 64
    images = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (b, cfg.image_size, cfg.image_size, 3)).astype('float32'))
    sizes = jnp.tile(jnp.asarray([[240.0, 240.0]], jnp.float32), (b, 1))
    params = model.init(jax.random.PRNGKey(0), images[:1],
                        method=MaskKeypointRCNN.init_params)

    def pfx_backbone(self, images, image_sizes):
        feats = self._features(images)
        return [jnp.sum(f.astype(jnp.float32)) for f in feats]

    def pfx_proposals(self, images, image_sizes):
        feats = self._features(images)
        boxes, scores, valid, _ = self._proposals(feats, image_sizes, False)
        return jnp.sum(boxes), jnp.sum(scores)

    out = {}
    base = timed_device_loop(
        lambda p, x, s: model.apply(p, x, s, method=pfx_backbone),
        params, images, sizes, inner=20)
    out['backbone_ms'] = round(base * 1000, 2)
    for clamp in (False, True):
        rpn.CLAMP_LEVEL_K = clamp
        dt = timed_device_loop(
            lambda p, x, s: model.apply(p, x, s, method=pfx_proposals),
            params, images, sizes, inner=20)
        out[f'proposal_stage_ms_clamp_{clamp}'] = round((dt - base) * 1000, 2)
    rpn.CLAMP_LEVEL_K = True
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
