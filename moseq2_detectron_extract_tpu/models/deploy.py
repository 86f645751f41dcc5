'''Model export: AOT-lowered StableHLO + params archive.

The TPU analog of the reference's TorchScript export
(m2de/model/deploy.py:24-123): the jitted inference step is lowered and
serialized with ``jax.export`` so deployment does not need the model-building
Python code; params + config ride alongside. An exported model re-imports as
an opaque callable with the same Predictor interface.
'''
import logging
import os
from typing import Optional

import jax
import numpy as np
from jax import export as jax_export

from moseq2_detectron_extract_tpu.io.util import ensure_dir
from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir, save_checkpoint
from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.predictor import Predictor
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN


def export_model(model_dir: str, checkpoint: str = 'last',
                 output: Optional[str] = None, batch_size: int = 10,
                 image_size: Optional[int] = None) -> str:
    '''Export a trained model as {config.yaml, params checkpoint, model.hlo}.

    The serialized computation maps normalized canvas images (B, S, S, 3) to
    the padded detection dict — fixed batch and image size are burned in,
    mirroring how TorchScript burned in the reference's run parameters.
    '''
    cfg, params, step = load_model_dir(model_dir, checkpoint)
    if image_size is not None:
        cfg = cfg.replace(image_size=int(image_size))
    model = MaskKeypointRCNN(cfg)

    def forward(params, images, image_sizes):
        return model.apply(params, images, image_sizes,
                           method=MaskKeypointRCNN.inference)

    s = cfg.image_size
    example_images = jax.ShapeDtypeStruct((batch_size, s, s, 3), np.float32)
    example_sizes = jax.ShapeDtypeStruct((batch_size, 2), np.float32)
    lowered = jax.jit(forward)
    exported = jax_export.export(lowered)(params, example_images, example_sizes)
    blob = exported.serialize()

    output = output or os.path.join(model_dir, 'export')
    ensure_dir(output)
    with open(os.path.join(output, 'model.hlo'), 'wb') as fh:
        fh.write(blob)
    cfg.to_yaml(os.path.join(output, 'config.yaml'))
    save_checkpoint(output, step or 0, {'params': params, 'step': step or 0})
    logging.info('exported %d-byte StableHLO computation', len(blob))
    return output


def load_exported_model(export_dir: str,
                        batch_size: Optional[int] = None) -> Predictor:
    '''Load an exported model as a Predictor running the SERIALIZED
    computation (no model re-trace) whenever the batch size matches the
    burned-in export batch; other batch shapes (e.g. the tail-pad path)
    rebuild from config + params like a normal Predictor.

    ``batch_size`` defaults to the export's burned-in batch so the exported
    program is used by default.
    '''
    cfg, params, _ = load_model_dir(export_dir)
    hlo_path = os.path.join(export_dir, 'model.hlo')
    exported = None
    if os.path.exists(hlo_path):
        with open(hlo_path, 'rb') as fh:
            exported = jax_export.deserialize(fh.read())
    export_batch = (exported.in_avals[-2].shape[0]
                    if exported is not None else None)
    if batch_size is None:
        batch_size = export_batch or 10
    predictor = Predictor(cfg, params, batch_size=batch_size)
    if exported is not None and export_batch == batch_size:
        call = jax.jit(exported.call)
        # Predictor._step_impl calls this as (params, images, image_sizes);
        # exported.call flattens params itself
        predictor._exported_forward = call  # noqa: SLF001
    elif exported is not None:
        logging.warning(
            'exported computation has batch %s but predictor batch is %d; '
            'falling back to re-traced model', export_batch, batch_size)
    return predictor
