'''Label-Studio annotation round-trip + dataset registry.

Parity target: m2de/io/annot.py. Replaces the Detectron2 Dataset/Metadata
catalogs with a light in-module registry; polygon rasterization and
point-in-polygon use cv2 instead of skimage.
'''
import json
import logging
import os
import pathlib
import random
import re
from typing import (Callable, Dict, List, Literal, MutableSequence, Optional,
                    Sequence, Tuple, TypedDict, Union)

import cv2
import numpy as np
from tqdm.auto import tqdm

from moseq2_detectron_extract_tpu.io.image import read_image
from moseq2_detectron_extract_tpu.proc.keypoints import (default_keypoint_colors,
                                                         default_keypoint_connection_rules,
                                                         default_keypoint_names)

MaskFormat = Literal['polygon', 'bitmask']


class SegmAnnotation(TypedDict):
    '''Segmentation annotation for one instance.'''
    bbox: Sequence[float]
    bbox_mode: str
    category_id: int
    segmentation: Union[Sequence[Sequence[float]], np.ndarray]


class KptSegmAnnotation(SegmAnnotation):
    '''Segmentation + keypoints annotation.'''
    keypoints: Sequence[float]


class DataItem(TypedDict):
    '''One training sample.'''
    file_name: str
    width: int
    height: int
    image_id: str
    rescale_intensity: float
    annotations: Sequence[KptSegmAnnotation]


# ---------------------------------------------------------------------------
# dataset registry (Detectron2 catalog replacement)
# ---------------------------------------------------------------------------

_DATASETS: Dict[str, Callable[[], MutableSequence[DataItem]]] = {}
_METADATA: Dict[str, dict] = {}


def dataset_catalog_get(name: str) -> MutableSequence[DataItem]:
    '''Resolve a registered dataset by name.'''
    return _DATASETS[name]()


def metadata_catalog_get(name: str) -> dict:
    '''Metadata dict for a registered dataset (auto-registers defaults).'''
    if name not in _METADATA:
        register_dataset_metadata(name)
    return _METADATA[name]


def dataset_is_registered(name: str) -> bool:
    '''True if a dataset name is registered.'''
    return name in _DATASETS or name in _METADATA


def register_dataset_metadata(name: str) -> None:
    '''Register default mouse metadata (m2de/io/annot.py:281-292).'''
    _METADATA[name] = {
        'thing_classes': ['mouse'],
        'thing_colors': [(0, 0, 255)],
        'keypoint_names': default_keypoint_names,
        'keypoint_flip_map': [],
        'keypoint_connection_rules': default_keypoint_connection_rules,
        'keypoint_colors': default_keypoint_colors,
    }


def split_test_train(annotations: MutableSequence[DataItem], split: float = 0.90):
    '''Shuffle + split into train/test accessor callables
    (m2de/io/annot.py:240-262).'''
    random.shuffle(annotations)
    split_idx = int(len(annotations) * split)
    return (lambda: annotations[:split_idx], lambda: annotations[split_idx:])


def register_datasets(annotations: MutableSequence[DataItem], split: bool = True) -> None:
    '''Register annotations as moseq_train / moseq_test
    (m2de/io/annot.py:264-278).'''
    if split:
        train_fn, test_fn = split_test_train(annotations)
        for name, fn in [('moseq_train', train_fn), ('moseq_test', test_fn)]:
            _DATASETS[name] = fn
            register_dataset_metadata(name)
    else:
        _DATASETS['moseq_train'] = lambda: annotations
        register_dataset_metadata('moseq_train')


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def poly_to_mask(poly: np.ndarray, out_shape: Tuple[int, int]) -> np.ndarray:
    '''Rasterize an (n, 2 [x, y]) polygon into a (H, W, 1) uint8 mask.'''
    mask = np.zeros(out_shape, dtype=np.uint8)
    pts = np.round(np.asarray(poly)).astype(np.int32)
    cv2.fillPoly(mask, [pts.reshape(-1, 1, 2)], 1)
    return mask[..., None]


def mask_to_poly(mask: np.ndarray) -> List[np.ndarray]:
    '''Boundary polygons of a binary mask (m2de/io/annot.py 'mask_to_poly').'''
    contours, _ = cv2.findContours(np.asarray(mask, np.uint8),
                                   cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    return list(contours)


def _point_in_poly(point: Tuple[float, float], poly: np.ndarray) -> bool:
    pts = np.asarray(poly, np.float32).reshape(-1, 1, 2)
    return cv2.pointPolygonTest(pts, (float(point[0]), float(point[1])), False) >= 0


# ---------------------------------------------------------------------------
# Label Studio parsing
# ---------------------------------------------------------------------------

def get_image_path(entry: dict) -> str:
    '''Resolve the image path of a task entry (m2de/io/annot.py:452-467),
    stripping the Label Studio upload hash prefix.'''
    if 'task_path' in entry:
        path = entry['task_path']
    elif 'data' in entry and 'image' in entry['data']:
        path = entry['data']['image']
    elif 'data' in entry and 'depth_image' in entry['data']:
        path = entry['data']['depth_image']
    else:
        raise KeyError('Could not locate image path from entry!')
    p = pathlib.Path(path)
    p = p.with_name(re.sub(r'(\w+-)', '', p.name))
    return str(p)


def get_polygon_data(entry: dict, mask_format: MaskFormat) -> SegmAnnotation:
    '''Polygon result (percent coords) -> pixel-space annotation
    (m2de/io/annot.py:387-417).'''
    poly = np.array(entry['value']['points'], dtype=float)
    poly[:, 1] = (poly[:, 1] * entry['original_width']) / 100
    poly[:, 0] = (poly[:, 0] * entry['original_height']) / 100

    if mask_format == 'polygon':
        seg = np.empty((poly.size,), dtype=poly.dtype)
        seg[0::2] = poly[:, 0]
        seg[1::2] = poly[:, 1]
        segmentation: Union[Sequence[Sequence[float]], np.ndarray] = [list(seg)]
    elif mask_format == 'bitmask':
        segmentation = poly_to_mask(poly, (entry['original_height'],
                                           entry['original_width']))[..., 0]
    else:
        raise RuntimeError(f"Got unsupported mask_format '{mask_format}'")

    return {
        'category_id': 0,
        'bbox_mode': 'XYXY_ABS',
        'segmentation': segmentation,
        'bbox': [float(np.min(poly[:, 0])), float(np.min(poly[:, 1])),
                 float(np.max(poly[:, 0])), float(np.max(poly[:, 1]))],
    }


def get_keypoint_data(entry: dict) -> Dict[str, dict]:
    '''Keypoint result (percent coords) -> {name: {x, y, v}}
    (m2de/io/annot.py:426-435).'''
    return {
        entry['value']['keypointlabels'][0]: {
            'x': (entry['value']['x'] * entry['original_width']) / 100,
            'y': (entry['value']['y'] * entry['original_height']) / 100,
            'v': 2,
        }
    }


def sort_keypoints(keypoint_order: List[str], keypoints: dict) -> List[float]:
    '''Flatten keypoints into [x, y, v, ...] in canonical order; missing
    keypoints become (0, 0, 0) (m2de/io/annot.py:438-449).'''
    out: List[float] = []
    for kp in keypoint_order:
        if kp in keypoints:
            k = keypoints[kp]
            out.extend([k['x'], k['y'], k['v']])
        else:
            out.extend([0, 0, 0])
    return out


def get_results_of_type(results: List[dict], annot_type: str) -> List[dict]:
    '''Filter result entries to one annotation type.'''
    return [r for r in results if r['type'] == annot_type]


def find_best_poly_overlap(polys: List[SegmAnnotation], point: dict) -> SegmAnnotation:
    '''Assign a keypoint to the containing polygon, else the closest one
    (m2de/io/annot.py:523-539).'''
    scores = []
    test_point = (point['x'], point['y'])
    for p in polys:
        coords = np.reshape(p['segmentation'][0], (-1, 2))
        if _point_in_poly(test_point, coords):
            return p
        dists = np.sqrt(np.sum((coords - np.asarray(test_point)) ** 2, axis=1))
        scores.append(np.min(dists))
    return polys[int(np.argmin(scores))]


def get_annotation_from_entry(entry: dict, key: str = 'annotations',
                              mask_format: MaskFormat = 'polygon',
                              keypoint_names: Optional[List[str]] = None) -> DataItem:
    '''Parse one Label Studio task entry (m2de/io/annot.py:470-519).'''
    if len(entry[key]) > 1:
        logging.warning('WARNING: Task %s: Multiple annotations found, only '
                        'taking the first', entry['id'])

    original_width = original_height = None
    for rslt in entry[key][0]['result']:
        if 'original_width' in rslt and 'original_height' in rslt:
            original_width = rslt['original_width']
            original_height = rslt['original_height']
            break

    poly_results = get_results_of_type(entry[key][0]['result'], 'polygonlabels')
    instances = [get_polygon_data(r, mask_format=mask_format) for r in poly_results]
    for instance in instances:
        instance['keypoints'] = {}

    for kpt in get_results_of_type(entry[key][0]['result'], 'keypointlabels'):
        kdata = get_keypoint_data(kpt)
        kname = list(kdata.keys())[0]
        owner = find_best_poly_overlap(instances, kdata[kname])
        if kname in owner['keypoints']:
            logging.warning('WARNING: Task %s: Keypoint "%s" has already been '
                            'parsed, replacing value', entry['id'], kname)
        owner['keypoints'].update(kdata)

    if keypoint_names is not None:
        for instance in instances:
            instance['keypoints'] = sort_keypoints(keypoint_names, instance['keypoints'])

    assert original_width is not None and original_height is not None
    return {
        'file_name': get_image_path(entry),
        'width': original_width,
        'height': original_height,
        'image_id': entry['id'],
        'annotations': instances,
        'rescale_intensity': 1,
    }


def read_annotations(annot_file: str, keypoint_names: Optional[List[str]] = None,
                     mask_format: MaskFormat = 'polygon',
                     rescale: float = 1.0) -> List[DataItem]:
    '''Read a Label Studio annotation export (m2de/io/annot.py:352-383).'''
    if keypoint_names is None:
        logging.warning('WARNING: Ignoring any keypoint information because '
                        '`keypoint_names` is None.')
    with open(annot_file, 'r', encoding='utf-8') as in_file:
        data = json.load(in_file)
    out = []
    for entry in data:
        key = 'annotations' if 'annotations' in entry else \
            ('completions' if 'completions' in entry else None)
        if key is None:
            raise ValueError('Cannot find annotation data for entry!')
        item = get_annotation_from_entry(entry, key=key, mask_format=mask_format,
                                         keypoint_names=keypoint_names)
        item['rescale_intensity'] = rescale
        out.append(item)
    return out


def read_tasks(tasks_file: str, rescale: float = 1.0) -> List[DataItem]:
    '''Read task entries without annotations (m2de/io/annot.py:330-349).'''
    tasks = []
    with open(tasks_file, 'r', encoding='utf-8') as in_file:
        data = json.load(in_file)
    for entry in data:
        image_path = get_image_path(entry)
        image = read_image(image_path)
        tasks.append({'file_name': image_path, 'width': image.shape[1],
                      'height': image.shape[0], 'image_id': image_path,
                      'rescale_intensity': rescale, 'annotations': []})
    return tasks


def load_annotations_helper(annot_files, image_format: str,
                            replace_paths: Optional[Sequence[Tuple[str, str]]] = None,
                            mask_format: MaskFormat = 'polygon',
                            register: bool = True,
                            show_info: bool = True) -> List[DataItem]:
    '''Load, fix paths, validate, optionally register + summarize
    (m2de/io/annot.py:87-120).'''
    logging.info('Loading annotations....')
    annotations: List[DataItem] = []
    for annot_f in annot_files:
        logging.info('Reading annotation file "%s"', annot_f)
        annot = read_annotations(annot_f, default_keypoint_names,
                                 mask_format=mask_format)
        logging.info(' -> Found %d annotations', len(annot))
        annotations.extend(annot)

    if replace_paths is not None:
        annotations = replace_multiple_data_paths_in_annotations(annotations,
                                                                 replace_paths)
    validate_annotations(annotations)
    if show_info:
        logging.info('Dataset information:')
        show_dataset_info(annotations, image_format)
    if register:
        register_datasets(annotations)
    return annotations


# ---------------------------------------------------------------------------
# dataset statistics
# ---------------------------------------------------------------------------

def get_dataset_statistics(dset: Sequence[DataItem], image_format: str):
    '''Mean/stdev per channel across a dataset (m2de/io/annot.py:123-153).'''
    nchannels = 1 if image_format == 'L' else 3
    count = 0
    mean = np.zeros((nchannels,), dtype=float)
    stdev = np.zeros((nchannels,), dtype=float)
    for d in tqdm(dset, desc='Computing Pixel Statistics', leave=False):
        image = read_image(d['file_name'])
        image = np.atleast_3d(image)
        if image.shape[2] == 1:
            image = np.repeat(image, nchannels, axis=2)
        count += 1
        for c in range(nchannels):
            mean[c] += image[:, :, c].mean()
            stdev[c] += image[:, :, c].std()
    return mean / max(count, 1), stdev / max(count, 1)


def get_dataset_im_size_range(dset: Sequence[DataItem]):
    '''((min_w, max_w), (min_h, max_h)) over a dataset.'''
    widths = [d['width'] for d in dset]
    heights = [d['height'] for d in dset]
    return ((np.min(widths), np.max(widths)), (np.min(heights), np.max(heights)))


def get_dataset_bbox_aspect_ratios(dset: Sequence[DataItem]) -> dict:
    '''Descriptive stats of first-instance bbox aspect ratios.'''
    ratios = []
    for d in dset:
        box = d['annotations'][0]['bbox']
        ax1, ax2 = box[2] - box[0], box[3] - box[1]
        ratios.append(max(ax1, ax2) / max(min(ax1, ax2), 1e-9))
    return {'min': float(np.min(ratios)), 'max': float(np.max(ratios)),
            'mean': float(np.mean(ratios)), 'median': float(np.median(ratios)),
            'stdev': float(np.std(ratios))}


def get_dataset_bbox_range(dset: Sequence[DataItem]) -> dict:
    '''Descriptive stats of first-instance bbox width/height.'''
    widths, heights = [], []
    for d in dset:
        box = d['annotations'][0]['bbox']
        widths.append(box[2] - box[0])
        heights.append(box[3] - box[1])
    def stats(vals):
        return {'min': np.min(vals), 'max': np.max(vals), 'mean': np.mean(vals),
                'median': np.median(vals), 'stdev': np.std(vals)}
    return {'width': stats(widths), 'height': stats(heights)}


def show_dataset_info(annotations: Sequence[DataItem], image_format: str) -> None:
    '''Log dataset summary (m2de/io/annot.py:583-609).'''
    logging.info('Number of Items: %d', len(annotations))
    sizes = get_dataset_im_size_range(annotations)
    logging.info('Image size range:')
    logging.info(' -> Width: %s - %s px', sizes[0][0], sizes[0][1])
    logging.info(' -> Height: %s - %s px', sizes[1][0], sizes[1][1])
    bbox_sizes = get_dataset_bbox_range(annotations)
    bbox_ratios = get_dataset_bbox_aspect_ratios(annotations)
    logging.info('Instance Bounding Box Sizes:')
    logging.info(' -> Width: %.2f - %.2f; mean %.2f +/- %.2f stdev',
                 bbox_sizes['width']['min'], bbox_sizes['width']['max'],
                 bbox_sizes['width']['mean'], bbox_sizes['width']['stdev'])
    logging.info(' -> Height: %.2f - %.2f; mean %.2f +/- %.2f stdev',
                 bbox_sizes['height']['min'], bbox_sizes['height']['max'],
                 bbox_sizes['height']['mean'], bbox_sizes['height']['stdev'])
    logging.info(' -> Ratio: %.2f - %.2f; mean %.2f +/- %.2f stdev',
                 bbox_ratios['min'], bbox_ratios['max'], bbox_ratios['mean'],
                 bbox_ratios['stdev'])
    means, stdevs = get_dataset_statistics(annotations, image_format=image_format)
    logging.info('Pixel Intensity Statistics:')
    for channel in range(means.shape[0]):
        logging.info(' -> Ch%d: mean %.2f +/- %.2f stdev', channel,
                     means[channel], stdevs[channel])


def replace_multiple_data_paths_in_annotations(annotations: List[DataItem],
                                               replace_paths) -> List[DataItem]:
    '''Apply a series of search/replace pairs to annotation file paths.'''
    for search, replace in replace_paths:
        annotations = replace_data_path_in_annotations(annotations, search, replace)
    return annotations


def replace_data_path_in_annotations(annotations: List[DataItem], search: str,
                                     replace: str) -> List[DataItem]:
    '''Substring replacement in annotation file paths.'''
    for annot in annotations:
        annot['file_name'] = annot['file_name'].replace(search, replace)
    return annotations


def validate_annotations(annotations: Sequence[DataItem]) -> bool:
    '''Ensure every annotation's image exists (m2de/io/annot.py:612-627).'''
    for annot in annotations:
        if not os.path.isfile(annot['file_name']):
            raise FileNotFoundError(annot['file_name'])
    return True
