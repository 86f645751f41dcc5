'''Dataset generation for annotation + model pre-annotation round-trip.

Parity target: m2de/dataset.py (frame sampling :26-171, PNG export :175-217,
Label Studio tasks :221-233, kmeans frame selection :236-288) and the
``infer-dataset`` pre-annotation path (m2de/cli.py:519-632).
'''
import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from moseq2_detectron_extract_tpu.io.image import write_image
from moseq2_detectron_extract_tpu.io.session import Session, Stream
from moseq2_detectron_extract_tpu.io.util import ensure_dir
from moseq2_detectron_extract_tpu.ops.preprocess import (apply_roi, prep_raw_frames,
                                                         scale_raw_frames)


def select_frames_kmeans(session: Session, num_samples: int, min_height: float,
                         max_height: float, downsample: int = 4,
                         chunk_size: int = 1000) -> List[int]:
    '''Pick diverse frames via MiniBatchKMeans over 4x-downsampled frames
    (m2de/dataset.py:236-288): one representative (nearest to center) per
    cluster.'''
    from sklearn.cluster import MiniBatchKMeans

    feats = []
    idxs = []
    iterator = session.iterate(chunk_size=chunk_size)
    iterator.attach_filter(Stream.DEPTH, lambda f: np.asarray(prep_raw_frames(
        f, bground_im=session.bground_im, roi=session.roi,
        vmin=min_height, vmax=max_height, dtype='uint8')))
    for frame_idxs, chunk in iterator:
        small = np.asarray(chunk)[:, ::downsample, ::downsample]
        feats.append(small.reshape(small.shape[0], -1).astype('float32'))
        idxs.extend(frame_idxs)
    data = np.concatenate(feats)
    idxs = np.asarray(idxs)

    km = MiniBatchKMeans(n_clusters=min(num_samples, len(idxs)), n_init=3,
                         random_state=0)
    labels = km.fit_predict(data)
    chosen = []
    for c in range(km.n_clusters):
        members = np.flatnonzero(labels == c)
        if len(members) == 0:
            continue
        dists = np.linalg.norm(data[members] - km.cluster_centers_[c], axis=1)
        chosen.append(int(idxs[members[np.argmin(dists)]]))
    return sorted(chosen)


def prepare_session_iterator(session: Session, sample_method: str, num_samples: int,
                             frame_indices: Optional[Sequence[int]],
                             min_height: float, max_height: float):
    '''Build the frame iterator for a sampling strategy
    (m2de/dataset.py:135-171).'''
    if sample_method == 'random':
        return session.sample(num_samples)
    if sample_method == 'uniform':
        step = max(session.nframes // max(num_samples, 1), 1)
        return session.index(list(range(0, session.nframes, step))[:num_samples])
    if sample_method == 'kmeans':
        chosen = select_frames_kmeans(session, num_samples, min_height, max_height)
        return session.index(chosen)
    if sample_method == 'list':
        if not frame_indices:
            raise ValueError('sample_method=list requires frame indices')
        return session.index(list(frame_indices))
    raise ValueError(f'unknown sample method {sample_method}')


def produce_frames(session: Session, iterator, output_dir: str,
                   with_rgb: bool = False) -> List[Dict]:
    '''Write sampled depth (and optional rgb) frames as PNGs + metadata
    (m2de/dataset.py:175-217).'''
    ensure_dir(output_dir)
    tasks = []
    for batch in iterator:
        frame_idxs = batch[0]
        depth_frames = np.asarray(batch[1])
        rgb_frames = np.asarray(batch[2]) if with_rgb and len(batch) > 2 else None
        for i, frame_idx in enumerate(frame_idxs):
            name = f'{session.session_id}_frame_{int(frame_idx):08d}'
            depth_path = os.path.join(output_dir, name + '_depth.png')
            write_image(depth_path, depth_frames[i], scale=False, dtype='uint8')
            task = {
                'id': name,
                'data': {
                    'depth_image': depth_path,
                    'session_id': session.session_id,
                    'frame_index': int(frame_idx),
                },
            }
            if rgb_frames is not None:
                rgb_path = os.path.join(output_dir, name + '_rgb.png')
                try:
                    import cv2
                    cv2.imwrite(rgb_path, rgb_frames[i][..., ::-1])
                    task['data']['rgb_image'] = rgb_path
                except ImportError:  # pragma: no cover
                    pass
            tasks.append(task)
    return tasks


def generate_dataset_for_session(input_file: str, output_dir: str,
                                 num_samples: int = 100,
                                 sample_method: str = 'random',
                                 frame_indices: Optional[Sequence[int]] = None,
                                 min_height: float = 0, max_height: float = 100,
                                 bg_roi_depth_range: Tuple[float, float] = (650, 750),
                                 with_rgb: bool = False) -> List[Dict]:
    '''ROI discovery + sampling + PNG export for one session
    (m2de/dataset.py:26-132).'''
    session = Session(input_file)
    session.find_roi(bg_roi_depth_range=bg_roi_depth_range,
                     cache_dir=ensure_dir(os.path.join(output_dir, 'cache',
                                                       session.session_id)))
    iterator = prepare_session_iterator(session, sample_method, num_samples,
                                        frame_indices, min_height, max_height)
    iterator.attach_filter(Stream.DEPTH, lambda f: np.asarray(scale_raw_frames(
        np.asarray(prep_raw_frames(f, bground_im=session.bground_im,
                                   roi=session.roi, vmin=min_height,
                                   vmax=max_height, dtype='uint8')),
        min_height, max_height)))
    if with_rgb and session.rgb_file is not None:
        iterator.attach_filter(Stream.RGB, lambda f: apply_roi(f, session.roi))

    tasks = produce_frames(session, iterator,
                           os.path.join(output_dir, session.session_id),
                           with_rgb=with_rgb)

    info_path = os.path.join(output_dir, session.session_id, 'info.json')
    with open(info_path, 'w', encoding='utf-8') as fh:
        json.dump({'session': str(session), 'num_samples': len(tasks),
                   'sample_method': sample_method,
                   'true_depth': session.true_depth}, fh, indent=2)
    return tasks


def generate_dataset_for_sessions(input_files: Sequence[str], output_dir: str,
                                  **kwargs) -> List[Dict]:
    '''Generate annotation datasets over many sessions.'''
    ensure_dir(output_dir)
    tasks: List[Dict] = []
    for input_file in input_files:
        logging.info('Sampling session %s', input_file)
        tasks.extend(generate_dataset_for_session(input_file, output_dir, **kwargs))
    return tasks


def write_label_studio_tasks(tasks: List[Dict], output_dir: str,
                             filename: str = 'tasks.json') -> str:
    '''Write the Label Studio tasks manifest (m2de/dataset.py:221-233).'''
    path = os.path.join(ensure_dir(output_dir), filename)
    with open(path, 'w', encoding='utf-8') as fh:
        json.dump(tasks, fh, indent=2)
    return path


def write_predictions_as_annotations(tasks_file: str, model_dir: str,
                                     checkpoint: str = 'last',
                                     output: Optional[str] = None,
                                     instance_threshold: float = 0.5) -> str:
    '''Run the model over tasks and emit Label Studio pre-annotations
    (polygon + keypoint results in percent coords), m2de/cli.py:519-632.'''
    from moseq2_detectron_extract_tpu.io.annot import get_image_path, mask_to_poly
    from moseq2_detectron_extract_tpu.io.image import read_image
    from moseq2_detectron_extract_tpu.models.predictor import Predictor
    from moseq2_detectron_extract_tpu.proc.keypoints import default_keypoint_names

    predictor = Predictor.from_model_dir(model_dir, checkpoint=checkpoint,
                                         batch_size=1,
                                         score_threshold=instance_threshold)
    with open(tasks_file, 'r', encoding='utf-8') as fh:
        tasks = json.load(fh)

    for task in tasks:
        image_path = get_image_path(task)
        image = np.atleast_3d(read_image(image_path))[:, :, 0].astype('uint8')
        h, w = image.shape
        out = predictor(image[None])
        results = []
        for d in range(out['valid'].shape[1]):
            if not out['valid'][0, d]:
                continue
            mask = np.asarray(out['masks'][0, d], np.uint8)
            for contour in mask_to_poly(mask):
                pts = contour.reshape(-1, 2).astype(float)
                results.append({
                    'type': 'polygonlabels',
                    'original_width': w, 'original_height': h,
                    'from_name': 'label', 'to_name': 'image',
                    'value': {
                        'points': [[100.0 * y / h, 100.0 * x / w] for x, y in pts],
                        'polygonlabels': ['mouse'],
                    },
                })
            for ki, kname in enumerate(default_keypoint_names):
                x, y, score = out['keypoints'][0, d, ki]
                results.append({
                    'type': 'keypointlabels',
                    'original_width': w, 'original_height': h,
                    'from_name': 'keypoints', 'to_name': 'image',
                    'value': {'x': 100.0 * float(x) / w, 'y': 100.0 * float(y) / h,
                              'keypointlabels': [kname], 'score': float(score)},
                })
        task['predictions'] = [{'result': results}]

    output = output or (os.path.splitext(tasks_file)[0] + '.predictions.json')
    with open(output, 'w', encoding='utf-8') as fh:
        json.dump(tasks, fh, indent=2)
    return output
