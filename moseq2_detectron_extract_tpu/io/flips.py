'''Manual flip corrections: flips-file parsing, xor-layered flip datasets,
h5 flip application with keypoint recomputation.

Parity target: m2de/io/flips.py:19-235.
'''
import itertools
import sys
from datetime import datetime
from functools import reduce
from typing import List, Optional, Tuple

import h5py
import numpy as np

from moseq2_detectron_extract_tpu.proc.angles import clamp_angles_rad
from moseq2_detectron_extract_tpu.proc.keypoints import (keypoints_to_dict,
                                                         load_keypoint_data_from_h5)


def count_frames(h5_file: str, frames_path: str = '/frames') -> int:
    '''Number of frames in a results h5.'''
    with h5py.File(h5_file, mode='r') as h5:
        return h5[frames_path].shape[0]


def read_flips_file(file_path: str, verify: bool = True, verify_vmin: int = 0,
                    verify_vmax: int = sys.maxsize) -> List[Tuple[int, int]]:
    '''Parse a flips annotation file into (start, stop) ranges.

    Lines hold ``start-stop`` integer pairs; ``#`` starts a comment.
    '''
    flips: List[Tuple[int, int]] = []
    with open(file_path, 'r', encoding='utf-8') as flip_file:
        for lno, line in enumerate(flip_file):
            line = line.strip()
            if not line or line[0] == '#':
                continue
            if '#' in line:
                line = line.split('#')[0]
            try:
                parts = [int(i.strip()) for i in line.split('-')]
            except ValueError as exc:
                raise RuntimeError(
                    f'File {file_path} line {lno + 1}: Expected only integer '
                    f'indicies! "{line}"') from exc
            if len(parts) != 2:
                raise RuntimeError(
                    f'File {file_path} line {lno + 1}: Expected exactly 2 indicies, '
                    f'but recieved {len(parts)}! "{line}"')
            flips.append((parts[0], parts[1]))

    if verify:
        try:
            verify_ranges(flips, vmin=verify_vmin, vmax=verify_vmax)
        except RuntimeError as exc:
            raise RuntimeError(f'File {file_path}:\n{exc}') from exc
    return flips


def verify_ranges(ranges: List[Tuple[int, int]], vmin: int = 0,
                  vmax: int = sys.maxsize) -> bool:
    '''Validate bounds and pairwise non-overlap of ranges; raises on errors.'''
    errors = []
    for start, stop in ranges:
        if stop < start:
            errors.append(f'Range ({start}, {stop}) stop cannot be less than start')
        if start < vmin:
            errors.append(f'Range ({start}, {stop}) start cannot be less than {vmin}')
        if stop > vmax:
            errors.append(f'Range ({start}, {stop}) stop cannot be greater than {vmax}')
    for r1, r2 in itertools.combinations(ranges, 2):
        if max(r1[0], r2[0]) < min(r1[1], r2[1]):
            errors.append(f'Range ({r1[0]}, {r1[1]}) overlaps with range '
                          f'({r2[0]}, {r2[1]})')
    if errors:
        raise RuntimeError('\n'.join(errors))
    return True


def find_unused_dataset_path(h5_file: str, path: str) -> str:
    '''First ``path_N`` dataset name not present in the h5.'''
    with h5py.File(h5_file, 'r') as h5:
        i = 0
        while f'{path}_{i}' in h5:
            i += 1
        return f'{path}_{i}'


def flip_horizontal(data: np.ndarray) -> np.ndarray:
    '''180-degree rotation of frames (the reference's "horizontal flip",
    m2de/io/flips.py:214-223).'''
    return np.rot90(data, k=2, axes=(-2, -1))


def flip_vertical(data: np.ndarray) -> np.ndarray:
    '''Vertical mirror of frames.'''
    return np.flip(data, axis=-2)


def recompute_flips(h5: h5py.File,
                    flips_path: str = '/metadata/extraction/flips') -> np.ndarray:
    '''XOR-reduce the layered ``flips_N`` datasets into the canonical flips.'''
    parts = flips_path.rsplit('/', 1)
    keys = sorted(f'{parts[0]}/{k}' for k in h5[parts[0]].keys()
                  if k.startswith(f'{parts[1]}_'))
    data = [h5[k][()] for k in keys]
    return reduce(np.logical_xor, data, np.zeros_like(data[0]))


def flip_dataset(h5_file: str, flip_mask: Optional[np.ndarray] = None,
                 flip_ranges: Optional[List[Tuple[int, int]]] = None,
                 frames_path: str = '/frames', frames_mask_path: str = '/frames_mask',
                 angle_path: str = '/scalars/angle',
                 flips_path: str = '/metadata/extraction/flips',
                 flip_class: int = 1) -> None:
    '''Apply manual flips to a results h5 (m2de/io/flips.py:94-188):
    rotate frames/masks 180 degrees, add pi to angles, record the flip layer as
    ``flips_N``, xor-reduce to the canonical flips, recompute keypoints.'''
    if flip_ranges is None and flip_mask is None:
        raise RuntimeError('One of flip_mask or flip_ranges must be supplied!')
    if flip_ranges is not None and flip_mask is not None:
        raise RuntimeError('Cannot supply both flip_mask and flip_ranges!')

    with h5py.File(h5_file, 'r+') as h5:
        nframes = h5[frames_path].shape[0]

        if flip_ranges is not None:
            verify_ranges(flip_ranges, vmax=nframes)
            real_flip_mask = np.zeros(nframes, dtype=bool)
            for start, stop in flip_ranges:
                real_flip_mask[start:stop] = bool(flip_class)
        else:
            real_flip_mask = (np.asarray(flip_mask) == flip_class)

        # layered flip bookkeeping: flips_0 archives the extraction flips
        i = 0
        while f'{flips_path}_{i}' in h5:
            i += 1
        new_flips_path = f'{flips_path}_{i}'
        if i == 0:
            h5.copy(flips_path, new_flips_path)
            new_flips_path = f'{flips_path}_1'
        h5.create_dataset(new_flips_path, data=real_flip_mask, dtype='bool',
                          compression='gzip')
        h5[new_flips_path].attrs['description'] = \
            'Manualally applied flips, False=no flip, True=flip'
        h5[new_flips_path].attrs['creation'] = \
            f'Created by moseq2-detectron-extract-tpu, manually applied flips, on {datetime.now()}'

        h5[flips_path][:] = recompute_flips(h5, flips_path=flips_path)

        flip_locations = np.nonzero(real_flip_mask)
        h5[frames_path][flip_locations] = flip_horizontal(h5[frames_path][flip_locations])
        h5[frames_mask_path][flip_locations] = \
            flip_horizontal(h5[frames_mask_path][flip_locations])
        h5[angle_path][flip_locations] = np.asarray(clamp_angles_rad(
            h5[angle_path][flip_locations] + np.pi))

        ref_keypoints = load_keypoint_data_from_h5(h5, coord_system='reference',
                                                   units='px')
        centroids = np.stack((h5['/scalars/centroid_x_px'][()],
                              h5['/scalars/centroid_y_px'][()]), axis=1)
        recomputed = keypoints_to_dict(ref_keypoints, h5[frames_path][()], centroids,
                                       np.rad2deg(h5[angle_path][()]),
                                       h5['/metadata/extraction/true_depth'][()])
        recomputed = {k: v for k, v in recomputed.items() if '_z_' not in k}
        for key, value in recomputed.items():
            h5[f'/keypoints/{key}'][...] = value
        h5.flush()
