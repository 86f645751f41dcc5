'''visualize_annotations / visualize_inference helpers (m2de/viz.py:29-73).'''
import os

import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

from moseq2_detectron_extract_tpu import viz
from moseq2_detectron_extract_tpu.io.image import write_image

H = W = 96


def write_item(tmp_path, idx):
    rng = np.random.default_rng(idx)
    image = rng.integers(0, 60, (H, W)).astype('uint8')
    image[30:60, 20:70] = 200
    path = str(tmp_path / f'frame{idx}.png')
    write_image(path, image, scale=False, dtype='uint8')
    mask = np.zeros((H, W), bool)
    mask[30:60, 20:70] = True
    kp = np.column_stack([np.linspace(25, 65, 8), np.full(8, 45.0),
                          np.full(8, 2.0)])
    return {
        'file_name': path, 'height': H, 'width': W, 'rescale_intensity': 1,
        'annotations': [{'bbox': [20.0, 30.0, 70.0, 60.0],
                         'segmentation': mask,
                         'keypoints': kp.ravel().tolist()}],
    }


class TestVisualizeAnnotations:
    def test_returns_figure_with_drawn_overlays(self, tmp_path):
        items = [write_item(tmp_path, i) for i in range(4)]
        fig, axs = viz.visualize_annotations(items, num=3, seed=0)
        assert len(axs) == 3
        # every axis holds a rendered image of the right size
        for ax in axs:
            (im,) = ax.get_images()
            assert im.get_array().shape[:2] == (H, W)
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_draw_annotation_item_marks_pixels(self, tmp_path):
        item = write_item(tmp_path, 0)
        rendered = viz.draw_annotation_item(item)
        assert rendered.shape == (H, W, 3)
        # overlays must actually change pixels vs the plain grayscale image
        plain = viz._gray_chunk_to_rgb(
            np.clip(np.atleast_3d(
                np.asarray(matplotlib.image.imread(item['file_name']))
            )[:, :, 0] * 255, 0, 255).astype('uint8')[None])[0]
        assert rendered.shape == plain.shape
        assert (rendered != plain).any()

    def test_polygon_segmentation_accepted(self, tmp_path):
        item = write_item(tmp_path, 1)
        item['annotations'][0]['segmentation'] = [
            [20.0, 30.0, 70.0, 30.0, 70.0, 60.0, 20.0, 60.0]]
        rendered = viz.draw_annotation_item(item)
        assert rendered.shape == (H, W, 3)


class TestVisualizeInference:
    def _pred(self, d=2):
        masks = np.zeros((d, H, W), bool)
        masks[0, 30:60, 20:70] = True
        masks[1, 10:20, 10:20] = True
        kp = np.zeros((d, 8, 3))
        kp[0, :, 0] = np.linspace(25, 65, 8)
        kp[0, :, 1] = 45.0
        kp[0, :, 2] = 2.0
        return {'masks': masks, 'keypoints': kp,
                'scores': np.array([0.9, 0.4]),
                'valid': np.array([True, False])}

    def test_scales_and_draws_only_valid_instances(self):
        frame = np.full((H, W), 10.0)
        frame[30:60, 20:70] = 45.0
        out = viz.visualize_inference(frame, self._pred(), min_height=0,
                                      max_height=100, scale=2.0)
        assert out.shape == (2 * H, 2 * W, 3)
        assert out.dtype == np.uint8
        # the invalid instance's region must stay untouched grayscale
        region = out[2 * 12:2 * 18, 2 * 12:2 * 18]
        assert (region[..., 0] == region[..., 1]).all()
        assert (region[..., 1] == region[..., 2]).all()

    def test_scale_one_keeps_resolution(self):
        frame = np.full((H, W), 30.0)
        out = viz.visualize_inference(frame, self._pred(), 0, 100, scale=1.0)
        assert out.shape == (H, W, 3)
        # valid instance overlay changed pixels inside its mask bbox
        plain = np.full((H, W, 3), int(0.3 * 255), 'uint8')
        assert (out[30:60, 20:70] != plain[30:60, 20:70]).any()


class TestStackVideosOutBuffer:
    '''stack_videos(out=) must zero padding regions itself: the preview
    writer stamps frame numbers into the composite's padding corner
    (ffmpeg block path), so a reused buffer carries garbage there.'''

    def test_out_padding_rezeroed_horizontal(self):
        left = np.full((2, 4, 3, 3), 7, 'uint8')
        right = np.full((2, 10, 5, 3), 9, 'uint8')
        buf = np.full((2, 10, 8, 3), 255, 'uint8')  # dirty reuse
        out = viz.stack_videos([left, right], 'horizontal', out=buf)
        assert out is buf
        assert (out[:, :4, :3] == 7).all()
        assert (out[:, 4:, :3] == 0).all()  # padding below the short video
        assert (out[:, :, 3:] == 9).all()

    def test_out_padding_rezeroed_vertical(self):
        top = np.full((2, 3, 4, 3), 7, 'uint8')
        bot = np.full((2, 5, 9, 3), 9, 'uint8')
        buf = np.full((2, 8, 9, 3), 123, 'uint8')
        out = viz.stack_videos([top, bot], 'vertical', out=buf)
        assert (out[:, :3, 4:] == 0).all()
        assert (out[:, 3:, :] == 9).all()

    def test_out_padding_rezeroed_diagonal(self):
        a = np.full((1, 3, 4, 3), 5, 'uint8')
        b = np.full((1, 2, 6, 3), 6, 'uint8')
        buf = np.full((1, 5, 10, 3), 200, 'uint8')
        out = viz.stack_videos([a, b], 'diagional', out=buf)
        ref = viz.stack_videos([a, b], 'diagional')
        np.testing.assert_array_equal(out, ref)

    def test_out_shape_mismatch_raises(self):
        a = np.zeros((1, 3, 4, 3), 'uint8')
        with np.testing.assert_raises(ValueError):
            viz.stack_videos([a], out=np.zeros((1, 3, 5, 3), 'uint8'))


class TestArenaViewMaskCrops:
    '''Window-crop overlay blending (the extraction-pipeline path) must be
    pixel-identical to full-frame mask blending, and the fast keypoint draw
    must match the legacy per-frame draw.'''

    def _inputs(self, n=4, h=96, w=120, c=32):
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 90, (n, h, w), dtype=np.uint8)
        crops = np.zeros((n, c, c), np.uint8)
        crops[:, 8:24, 6:26] = 1
        origins = np.stack([rng.integers(0, h - c, n),
                            rng.integers(0, w - c, n)], axis=1).astype('int32')
        full = np.zeros((n, h, w), np.uint8)
        for i, (y0, x0) in enumerate(origins):
            full[i, y0:y0 + c, x0:x0 + c] = crops[i]
        kpts = np.stack([rng.uniform(5, w - 5, (n, 8)),
                         rng.uniform(5, h - 5, (n, 8)),
                         np.full((n, 8), 2.0)], axis=-1)
        kpts[0, 3] = np.nan  # a missing keypoint must be skipped identically
        boxes = np.stack([np.full(n, 10.0), np.full(n, 12.0),
                          np.full(n, 40.0), np.full(n, 44.0)], axis=1)[:, None]
        boxes[1] = np.nan
        return frames, crops, origins, full, kpts, boxes

    def test_crops_equal_full_masks(self):
        frames, crops, origins, full, kpts, boxes = self._inputs()
        view = viz.ArenaView(None, scale=1.0)
        a = view.render(frames.copy(), masks=full, keypoints=kpts, boxes=boxes)
        b = view.render(frames.copy(), mask_crops=crops, mask_origins=origins,
                        keypoints=kpts, boxes=boxes)
        np.testing.assert_array_equal(a, b)

    def test_crops_scaled_fallback(self):
        frames, crops, origins, full, kpts, boxes = self._inputs()
        view = viz.ArenaView(None, scale=2.0)
        a = view.render(frames.copy(), masks=full, keypoints=kpts)
        b = view.render(frames.copy(), mask_crops=crops, mask_origins=origins,
                        keypoints=kpts)
        np.testing.assert_array_equal(a, b)

    def test_fast_keypoint_draw_matches_legacy(self):
        rng = np.random.default_rng(5)
        kpts = np.stack([rng.uniform(3, 90, (3, 8)),
                         rng.uniform(3, 90, (3, 8)),
                         np.full((3, 8), 2.0)], axis=-1)
        kpts[1, 2] = np.nan
        legacy = np.zeros((3, 96, 96, 3), np.uint8)
        fast = np.zeros((3, 96, 96, 3), np.uint8)
        pts, fin, colors, skeleton = viz.precompute_keypoint_draws(kpts)
        for i in range(3):
            viz.draw_keypoints(legacy[i], kpts[i])
            viz.draw_keypoints_fast(fast[i], pts[i], fin[i], colors, skeleton)
        np.testing.assert_array_equal(legacy, fast)
