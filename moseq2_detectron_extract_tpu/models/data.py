'''Host-side training input pipeline.

Parity target: m2de/model/mapper.py (MoseqDatasetMapper): reads images with
intensity rescale, rasterizes polygon annotations to bitmasks, and hands
fixed-shape padded batches to the device — where the full augmentation stack
runs (models/augment.py), instead of 4 CPU dataloader workers.
'''
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from moseq2_detectron_extract_tpu.io.annot import DataItem, poly_to_mask
from moseq2_detectron_extract_tpu.io.image import read_image
from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.predictor import compute_test_scale


def load_sample(item: DataItem, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    '''Read + canvas-resize one annotated sample into fixed shapes.

    Returns image (S, S) float32, masks (G, S, S) bool, keypoints (G, K, 3),
    valid (G,). Geometry is pre-scaled so the content fits the train canvas;
    random rotation/scale happens on device.
    '''
    s = cfg.image_size
    g = cfg.max_gt_instances
    k = cfg.num_keypoints

    image = read_image(item['file_name'])
    image = np.atleast_3d(np.asarray(image))[:, :, 0].astype('float32')
    rescale = item.get('rescale_intensity') or 1.0
    if rescale != 1.0:
        image = image * rescale

    h, w = image.shape
    scale = compute_test_scale(h, w, cfg.min_size_train, cfg.max_size_train)
    new_h, new_w = min(int(h * scale + 0.5), s), min(int(w * scale + 0.5), s)

    try:
        import cv2
        resized = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        ys = (np.arange(new_h) / scale).astype(int).clip(0, h - 1)
        xs = (np.arange(new_w) / scale).astype(int).clip(0, w - 1)
        resized = image[np.ix_(ys, xs)]

    canvas = np.zeros((s, s), dtype='float32')
    canvas[:new_h, :new_w] = resized

    masks = np.zeros((g, s, s), dtype=bool)
    keypoints = np.zeros((g, k, 3), dtype='float32')
    valid = np.zeros((g,), dtype=bool)

    for gi, annot in enumerate(item['annotations'][:g]):
        seg = annot['segmentation']
        if isinstance(seg, np.ndarray):
            mask_full = seg.astype(bool)
        else:
            poly = np.reshape(np.asarray(seg[0], dtype=float), (-1, 2))
            mask_full = poly_to_mask(poly, (h, w))[..., 0].astype(bool)
        # resize mask with the same scale (nearest)
        ys = np.clip((np.arange(new_h) / scale).astype(int), 0, h - 1)
        xs = np.clip((np.arange(new_w) / scale).astype(int), 0, w - 1)
        masks[gi, :new_h, :new_w] = mask_full[np.ix_(ys, xs)]
        valid[gi] = masks[gi].any()

        kp = np.asarray(annot.get('keypoints', []), dtype='float32').reshape(-1, 3)
        if kp.shape[0] == k:
            keypoints[gi, :, 0] = kp[:, 0] * scale
            keypoints[gi, :, 1] = kp[:, 1] * scale
            keypoints[gi, :, 2] = kp[:, 2]

    return {'image': canvas, 'masks': masks, 'keypoints': keypoints, 'valid': valid}


class TrainLoader:
    '''Infinite shuffled batch iterator with background prefetch.

    One prefetch thread replaces the reference's 4 dataloader workers
    (m2de/model/config.py:48) — decode cost is low at 256x256 grayscale and
    the heavy augmentation runs on device.
    '''

    def __init__(self, items: Sequence[DataItem], cfg: ModelConfig,
                 batch_size: Optional[int] = None, seed: int = 0,
                 prefetch: int = 4):
        if not items:
            raise ValueError('empty training dataset')
        self.items = list(items)
        self.cfg = cfg
        self.batch_size = batch_size or cfg.ims_per_batch
        self.rng = np.random.default_rng(seed)
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._cache: Dict[str, Dict[str, np.ndarray]] = {}
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _sample_batch(self) -> Dict[str, np.ndarray]:
        idxs = self.rng.integers(0, len(self.items), self.batch_size)
        samples = []
        for i in idxs:
            item = self.items[int(i)]
            key = str(item['image_id'])
            if key not in self._cache:
                self._cache[key] = load_sample(item, self.cfg)
            samples.append(self._cache[key])
        return {field: np.stack([s[field] for s in samples])
                for field in ('image', 'masks', 'keypoints', 'valid')}

    def _worker(self):
        while not self._stop.is_set():
            batch = self._sample_batch()
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.25)
                    break
                except queue_mod.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        return self._queue.get()

    def close(self):
        '''Stop the prefetch thread.'''
        self._stop.set()


def eval_batches(items: Sequence[DataItem], cfg: ModelConfig,
                 batch_size: Optional[int] = None) -> List[Dict[str, np.ndarray]]:
    '''Deterministic batches over a dataset (padded final batch).'''
    batch_size = batch_size or cfg.ims_per_batch
    out = []
    for start in range(0, len(items), batch_size):
        chunk = [load_sample(it, cfg) for it in items[start:start + batch_size]]
        n_true = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        batch = {field: np.stack([s[field] for s in chunk])
                 for field in ('image', 'masks', 'keypoints', 'valid')}
        batch['n_true'] = n_true
        out.append(batch)
    return out
