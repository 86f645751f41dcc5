'''Inference wrapper: preprocessing, jitted forward, detector postprocess.

Parity target: m2de/model/predict.py (Predictor) + Detectron2's
detector_postprocess. The entire step — uint8 depth frames in, full-resolution
masks/keypoints out — is one jitted XLA program per (batch, frame-shape)
bucket; resize/normalize/paste all happen on device.
'''
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN


from moseq2_detectron_extract_tpu.ops.preprocess import \
    compute_test_scale  # noqa: F401 (canonical impl; re-exported for API compat)


class Predictor:
    '''Runs the Mask+Keypoint R-CNN on batches of depth frames.

    Accepts (N, H, W) or (N, H, W, C) uint8 frames (grayscale is replicated
    to 3 channels like m2de/model/predict.py:74-77). Returns numpy arrays:
    masks (N, D, H, W) bool, keypoints (N, D, K, 3) in input-frame pixel
    coords, scores (N, D), valid (N, D).
    '''

    def __init__(self, cfg: ModelConfig, params, batch_size: int = 10,
                 score_threshold: Optional[float] = None):
        self.cfg = cfg if score_threshold is None else \
            cfg.replace(test_score_thresh=float(score_threshold))
        self.model = MaskKeypointRCNN(self.cfg)
        self.params = params
        self.batch_size = int(batch_size)
        # deploy.load_exported_model installs the deserialized jax.export
        # computation here; _step_impl then runs the serialized program
        # instead of re-tracing the model (m2de/model/deploy.py:24-123)
        self._exported_forward = None

    def to_device(self, device) -> 'Predictor':
        '''Return a Predictor whose params are committed to ``device``.

        `jax.default_device` does NOT move already-committed arrays, so
        per-device session sharding (parallel/sessions.py) must device_put
        the params explicitly; jit then places each instance's programs on
        its params' device (self is a static arg, so compiled caches are
        per-instance and cannot cross devices).
        '''
        clone = Predictor.__new__(Predictor)
        clone.cfg = self.cfg
        clone.model = self.model
        clone.params = jax.device_put(self.params, device)
        clone.batch_size = self.batch_size
        clone._exported_forward = None  # exported blobs are single-device
        return clone

    @classmethod
    def from_model_dir(cls, model_dir: str, checkpoint: str = 'last',
                       batch_size: int = 10,
                       score_threshold: Optional[float] = None) -> 'Predictor':
        '''Load config + weights from a model directory.'''
        from moseq2_detectron_extract_tpu.models.checkpoint import load_model_dir
        cfg, params, _ = load_model_dir(model_dir, checkpoint)
        return cls(cfg, params, batch_size=batch_size, score_threshold=score_threshold)

    # ------------------------------------------------------------------ step
    def _test_geometry(self, frame_shape: Tuple[int, int]):
        '''(scale, new_h, new_w) of ResizeShortestEdge for ``frame_shape``.'''
        cfg = self.cfg
        h, w = frame_shape
        canvas = cfg.image_size
        scale = compute_test_scale(h, w, cfg.min_size_test, cfg.max_size_test)
        new_h, new_w = int(h * scale + 0.5), int(w * scale + 0.5)
        return scale, min(new_h, canvas), min(new_w, canvas)

    def _step_impl(self, frames, frame_shape: Tuple[int, int],
                   with_select: bool = False):
        '''frames (B, H, W) uint8 -> detection dict at frame resolution.'''
        cfg = self.cfg
        canvas = cfg.image_size
        scale, new_h, new_w = self._test_geometry(frame_shape)

        x = frames.astype(jnp.float32)
        x = jax.image.resize(x, (x.shape[0], new_h, new_w), method='bilinear')
        x = jnp.pad(x, ((0, 0), (0, canvas - new_h), (0, canvas - new_w)))
        return self._detect_impl(x, frame_shape, with_select)

    def _prescaled_impl(self, canvas_frames, frame_shape: Tuple[int, int],
                        with_select: bool = False):
        '''Host-prescaled variant: ``canvas_frames`` (B, canvas, canvas)
        uint8 already hold the ResizeShortestEdge'd content in the top-left
        corner (see :func:`prescale_frames_host`); the device program skips
        the full-res upload + resize. The rest (normalize, detect,
        full-res postprocess, optional fused selection) is identical.'''
        return self._detect_impl(canvas_frames.astype(jnp.float32),
                                 frame_shape, with_select)

    def _detect_impl(self, x, frame_shape: Tuple[int, int],
                     with_select: bool = False):
        '''Shared tail: x (B, canvas, canvas) f32 content-in-corner.'''
        cfg = self.cfg
        h, w = frame_shape
        scale, new_h, new_w = self._test_geometry(frame_shape)
        x = jnp.repeat(x[..., None], 3, axis=-1)  # grayscale -> RGB replication
        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)
        x = (x - mean) / std

        b = x.shape[0]
        image_sizes = jnp.tile(jnp.asarray([[new_h, new_w]], jnp.float32), (b, 1))
        if self._exported_forward is not None and b == self.batch_size:
            out = self._exported_forward(self.params, x, image_sizes)
        else:
            out = self.model.apply(self.params, x, image_sizes,
                                   method=MaskKeypointRCNN.inference)

        # detector_postprocess: rescale to original frame resolution
        inv = 1.0 / scale
        boxes = out['boxes'] * inv
        keypoints = out['keypoints'].at[..., :2].multiply(inv)

        mask_canvas = out['masks'][:, :, :new_h, :new_w].astype(jnp.float32)
        d = mask_canvas.shape[1]
        masks = jax.image.resize(mask_canvas, (b, d, h, w), method='bilinear') > 0.5
        masks = masks & out['valid'][:, :, None, None]

        result = {
            'boxes': boxes, 'scores': out['scores'], 'classes': out['classes'],
            'valid': out['valid'], 'masks': masks, 'keypoints': keypoints,
            'mask_probs': out['mask_probs'],
        }
        if with_select:
            # extraction-pipeline selection fused into the same program:
            # mask-IoU NMS + centers run here while the full-res masks are
            # still batch-local, instead of a second dispatch re-reading the
            # whole-chunk (N, D, H, W) mask tensor from HBM
            from moseq2_detectron_extract_tpu.ops.instances import \
                nms_and_centers
            keep, centers, iou = nms_and_centers(masks, out['scores'],
                                                 out['valid'])
            result.update(keep=keep, centers=centers, mask_iou=iou)
        return result

    @functools.partial(jax.jit,
                       static_argnames=('self', 'frame_shape', 'with_select'))
    def _step(self, frames, frame_shape: Tuple[int, int],
              with_select: bool = False):
        return self._step_impl(frames, frame_shape, with_select=with_select)

    @functools.partial(jax.jit,
                       static_argnames=('self', 'frame_shape', 'with_select'))
    def _chunk_step(self, frames, frame_shape: Tuple[int, int],
                    with_select: bool = False):
        '''Whole-chunk inference as ONE device program: frames (N, H, W) with
        N a multiple of batch_size; batches run sequentially via lax.map so
        activation memory stays bounded while host<->device round trips drop
        from N/batch to one.'''
        n, h, w = frames.shape
        nb = n // self.batch_size
        batched = frames.reshape(nb, self.batch_size, h, w)
        return jax.lax.map(
            lambda b: self._step_impl(b, frame_shape, with_select=with_select),
            batched)

    def _chunk_with_retry(self, frames, frame_shape, attempts: int = 3,
                          with_select: bool = False):
        '''Retry wrapper for the chunk-level program.'''
        return self._retry(
            lambda: self._chunk_step(frames, frame_shape,
                                     with_select=with_select), attempts)

    @functools.partial(jax.jit,
                       static_argnames=('self', 'frame_shape', 'with_select'))
    def _chunk_step_prescaled(self, canvas_frames,
                              frame_shape: Tuple[int, int],
                              with_select: bool = False):
        n, ch, cw = canvas_frames.shape
        nb = n // self.batch_size
        batched = canvas_frames.reshape(nb, self.batch_size, ch, cw)
        return jax.lax.map(
            lambda b: self._prescaled_impl(b, frame_shape,
                                           with_select=with_select), batched)

    def predict_prescaled(self, canvas_frames, frame_shape: Tuple[int, int],
                          select: bool = False) -> Dict[str, jnp.ndarray]:
        '''Chunk inference over host-prescaled frames (device-resident out).

        ``canvas_frames``: (N, canvas, canvas) uint8 from
        :func:`prescale_frames_host` — ~3-4x fewer H2D bytes than the
        full-res path at production geometry. ``frame_shape`` is the
        ORIGINAL (h, w); outputs are in original-frame coordinates exactly
        like :meth:`__call__`. N is padded up to a batch multiple.
        '''
        n = canvas_frames.shape[0]
        dev = jnp.asarray(canvas_frames)
        pad = (-n) % self.batch_size
        if pad:
            dev = jnp.concatenate(
                [dev, jnp.zeros((pad,) + dev.shape[1:], dev.dtype)])
        out = self._retry(lambda: self._chunk_step_prescaled(
            dev, tuple(frame_shape), with_select=select))
        return {k: v.reshape((-1,) + v.shape[2:])[:n] for k, v in out.items()}

    def _step_with_retry(self, batch, frame_shape, attempts: int = 3,
                         with_select: bool = False):
        '''Retry wrapper for the per-batch program.'''
        return self._retry(
            lambda: self._step(batch, frame_shape, with_select=with_select),
            attempts)

    def _retry(self, fn, attempts: int = 3):
        '''Remote-compile services can drop connections transiently; retry.'''
        for attempt in range(attempts):
            try:
                return fn()
            except Exception as exc:  # noqa: BLE001
                transient = 'INTERNAL' in str(exc) or 'remote_compile' in str(exc)
                if attempt == attempts - 1 or not transient:
                    raise
                import logging
                import time
                logging.warning('transient device error (attempt %d): %s',
                                attempt + 1, str(exc)[:200])
                time.sleep(2.0 * (attempt + 1))
        raise RuntimeError('unreachable')

    # ------------------------------------------------------------------ call
    def __call__(self, frames, return_device: bool = False,
                 select: bool = False) -> Dict[str, np.ndarray]:
        '''Run inference over (N, H, W[, C]) frames in fixed-size batches.

        ``frames`` may be a numpy array or an already-device-resident jax
        array. With ``return_device=True`` the outputs stay on device (no
        device->host transfer) — the extraction pipeline consumes them there.
        With ``select=True`` the chunk program also returns the extraction
        pipeline's instance selection (``keep``/``centers``/``mask_iou``,
        see ops/instances.py:nms_and_centers) fused into the same dispatch.
        '''
        if frames.ndim == 4:  # take first channel of multi-channel input
            frames = frames[..., 0]
        n, h, w = frames.shape
        dev_frames = jnp.asarray(frames)

        if return_device and n >= self.batch_size:
            # single-program path: pad N up to a batch multiple, one dispatch
            pad = (-n) % self.batch_size
            if pad:
                dev_frames = jnp.concatenate(
                    [dev_frames, jnp.zeros((pad, h, w), dev_frames.dtype)])
            out = self._chunk_with_retry(dev_frames, (h, w),
                                         with_select=select)
            return {k: v.reshape((-1,) + v.shape[2:])[:n] for k, v in out.items()}

        outs = []
        for start in range(0, n, self.batch_size):
            batch = jax.lax.dynamic_slice_in_dim(
                dev_frames, min(start, max(n - self.batch_size, 0)),
                min(self.batch_size, n), axis=0)
            pad = self.batch_size - batch.shape[0]
            if pad:  # only when n < batch_size
                batch = jnp.concatenate(
                    [batch, jnp.zeros((pad, h, w), batch.dtype)])
            out = self._step_with_retry(batch, (h, w), with_select=select)
            if start + self.batch_size > n:
                keep = n - start
                skip = self.batch_size - keep
                out = {k: v[skip:] if pad == 0 else v[:keep] for k, v in out.items()}
            outs.append(out)

        merged = {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}
        if return_device:
            return merged
        return {k: np.asarray(v) for k, v in merged.items()}
