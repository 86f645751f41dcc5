'''Pallas fused clean kernel vs the XLA ops reference (bit-exact for
zero-bordered ROI-masked frames).'''
import cv2
import numpy as np

from moseq2_detectron_extract_tpu.ops.pallas_clean import fused_clean_frames
from moseq2_detectron_extract_tpu.proc.features import clean_frames


def _blob_frames(rng, n=3, h=96, w=130):
    frames = np.zeros((n, h, w), dtype='uint8')
    for i in range(n):
        cv2.ellipse(frames[i], (55 + 7 * i, 40 + 3 * i), (28, 13), 25 * i,
                    0, 360, 60, -1)
        noise = rng.integers(0, 25, frames[i].shape) * (frames[i] > 0)
        frames[i] = np.clip(frames[i].astype(int) + noise, 0, 255).astype('uint8')
    return frames


def test_matches_xla_clean_frames(rng):
    frames = _blob_frames(rng)
    ref = np.asarray(clean_frames(frames, iters_tail=3))
    out = np.asarray(fused_clean_frames(frames))
    np.testing.assert_array_equal(out, ref)


def test_non_tile_aligned_shapes(rng):
    frames = _blob_frames(rng, n=2, h=77, w=101)
    ref = np.asarray(clean_frames(frames, iters_tail=3))
    out = np.asarray(fused_clean_frames(frames))
    np.testing.assert_array_equal(out, ref)
