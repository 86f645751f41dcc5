'''Tests for annotation parsing, quality reports, and dataset tooling.'''
import json
import os

import h5py
import numpy as np
import pytest

from moseq2_detectron_extract_tpu.io.annot import (dataset_catalog_get,
                                                   find_best_poly_overlap,
                                                   get_annotation_from_entry,
                                                   metadata_catalog_get, poly_to_mask,
                                                   read_annotations, register_datasets,
                                                   sort_keypoints,
                                                   validate_annotations)
from moseq2_detectron_extract_tpu.proc.keypoints import default_keypoint_names
from moseq2_detectron_extract_tpu.quality import (collapse_indices_to_ranges,
                                                  find_outliers_h5)


def make_entry(image_path, width=100, height=80):
    '''A minimal Label Studio task entry with one polygon + two keypoints.

    Label Studio polygon points are percent coords; the parser follows the
    reference's axis convention (m2de/io/annot.py:387-417).
    '''
    poly_pct = [[10, 10], [10, 60], [50, 60], [50, 10]]
    results = [{
        'type': 'polygonlabels',
        'original_width': width, 'original_height': height,
        'value': {'points': poly_pct, 'polygonlabels': ['Mouse']},
    }]
    for name, (x_pct, y_pct) in [('Nose', (20, 30)), ('TailBase', (40, 30))]:
        results.append({
            'type': 'keypointlabels',
            'original_width': width, 'original_height': height,
            'value': {'x': x_pct, 'y': y_pct, 'keypointlabels': [name]},
        })
    return {'id': 'task-1', 'data': {'image': image_path},
            'annotations': [{'result': results}]}


class TestAnnotations:
    def test_parse_entry(self, tmp_path):
        entry = make_entry(str(tmp_path / 'img.png'))
        item = get_annotation_from_entry(entry, keypoint_names=default_keypoint_names)
        assert item['width'] == 100 and item['height'] == 80
        assert len(item['annotations']) == 1
        annot = item['annotations'][0]
        # 8 keypoints x 3 values, missing ones zeroed
        assert len(annot['keypoints']) == 24
        nose = annot['keypoints'][0:3]
        assert nose[2] == 2  # visible
        # percent -> pixel conversion used entry['original_*'] like the reference
        assert nose[0] > 0 and nose[1] > 0
        # missing keypoint (Left Ear) zeroed
        assert annot['keypoints'][3:6] == [0, 0, 0]

    def test_read_annotations_file(self, tmp_path):
        img = tmp_path / 'img.png'
        import cv2
        cv2.imwrite(str(img), np.zeros((80, 100), np.uint8))
        annot_file = tmp_path / 'annot.json'
        annot_file.write_text(json.dumps([make_entry(str(img))]))
        items = read_annotations(str(annot_file), default_keypoint_names)
        assert len(items) == 1
        validate_annotations(items)

    def test_register_and_catalog(self, tmp_path):
        entry = make_entry(str(tmp_path / 'img.png'))
        items = [get_annotation_from_entry(entry, keypoint_names=default_keypoint_names)
                 for _ in range(10)]
        register_datasets(items, split=True)
        train = dataset_catalog_get('moseq_train')
        test = dataset_catalog_get('moseq_test')
        assert len(train) == 9 and len(test) == 1
        meta = metadata_catalog_get('moseq_train')
        assert meta['thing_classes'] == ['mouse']
        assert meta['keypoint_names'] == default_keypoint_names

    def test_poly_to_mask(self):
        poly = np.array([[2, 2], [2, 8], [8, 8], [8, 2]], float)
        mask = poly_to_mask(poly, (12, 12))[..., 0]
        assert mask[5, 5] == 1
        assert mask[0, 0] == 0

    def test_keypoint_instance_assignment(self):
        polys = [
            {'segmentation': [[0, 0, 0, 10, 10, 10, 10, 0]]},
            {'segmentation': [[20, 20, 20, 30, 30, 30, 30, 20]]},
        ]
        inside = find_best_poly_overlap(polys, {'x': 25, 'y': 25})
        assert inside is polys[1]
        nearest = find_best_poly_overlap(polys, {'x': 12, 'y': 11})
        assert nearest is polys[0]

    def test_sort_keypoints_order(self):
        kps = {'TailTip': {'x': 1, 'y': 2, 'v': 2}, 'Nose': {'x': 3, 'y': 4, 'v': 2}}
        flat = sort_keypoints(default_keypoint_names, kps)
        assert flat[0:3] == [3, 4, 2]
        assert flat[-3:] == [1, 2, 2]


class TestQuality:
    def test_collapse_ranges(self):
        assert collapse_indices_to_ranges([1, 2, 3, 7, 9, 10]) == \
            [(1, 3), (7, 7), (9, 10)]

    def test_find_outliers_h5(self, tmp_path):
        path = str(tmp_path / 'results.h5')
        n = 50
        with h5py.File(path, 'w') as h5:
            h5.create_dataset('frames', data=np.zeros((n, 8, 8), 'uint8'))
            for cs in ['reference', 'rotated']:
                for name in default_keypoint_names:
                    x = np.full(n, 10.0)
                    y = np.full(n, 20.0)
                    if name == 'Nose':
                        x[25] = 500.0  # a jump outlier
                    for suffix, vals in [('x_px', x), ('y_px', y),
                                         ('x_mm', x), ('y_mm', y),
                                         ('z_mm', np.zeros(n)),
                                         ('score', np.ones(n))]:
                        h5.create_dataset(f'keypoints/{cs}/{name}_{suffix}', data=vals)
            h5.create_dataset('metadata/extraction/flips', data=np.zeros(n, bool))
        out = find_outliers_h5(path)
        assert 25 in out['jumping_keypoints']
        assert os.path.exists(str(tmp_path / 'results.jumping_keypoints.txt'))


class TestKalmanChunkState:
    def test_state_carries_across_chunks(self):
        '''smooth_update must carry state so chunk boundaries are seamless
        (m2de/proc/kalman.py:386-400 behavior).'''
        from moseq2_detectron_extract_tpu.proc.kalman import (KalmanTracker,
                                                              KalmanTrackerPoint2D)
        rng = np.random.default_rng(0)
        t = np.arange(100)
        traj = np.stack([t * 1.0, 50 + 10 * np.sin(t / 10)], axis=1)
        obs = traj + rng.normal(0, 0.5, traj.shape)

        tracker = KalmanTracker([KalmanTrackerPoint2D(order=3)])
        tracker.initialize([obs[:50]])
        first, = tracker.smooth_update([obs[:50]])
        second, = tracker.smooth_update([obs[50:]])
        # the first frames of chunk 2 should continue the trajectory, not
        # re-initialize from the prior
        err = np.abs(second[:5] - traj[50:55]).mean()
        assert err < 2.0
