'''Results HDF5 schema and chunked writing.

Parity target: m2de/io/result.py:14-199 — identical dataset names, dtypes,
and descriptions so downstream MoSeq tooling can consume our files.
'''
import os
from typing import Dict, Optional, Union

import h5py
import numpy as np

from moseq2_detectron_extract_tpu import __version__
from moseq2_detectron_extract_tpu.io.util import dict_to_h5
from moseq2_detectron_extract_tpu.proc.keypoints import keypoint_attributes
from moseq2_detectron_extract_tpu.proc.scalars import scalar_attributes


def create_extract_h5(h5_file: h5py.File, config_data: dict, status_dict: dict,
                      param_annotations: Optional[Dict[str, str]] = None) -> None:
    '''Create all datasets + metadata for an extraction results file.'''
    nframes = config_data['nframes']

    h5_file.create_dataset('metadata/uuid', data=status_dict['uuid'])

    scalars_attrs = scalar_attributes()
    for scalar, desc in scalars_attrs.items():
        h5_file.create_dataset(f'scalars/{scalar}', (nframes,), 'float32',
                               compression='gzip')
        h5_file[f'scalars/{scalar}'].attrs['description'] = desc

    keypoint_attrs = keypoint_attributes()
    for kp, desc in keypoint_attrs.items():
        h5_file.create_dataset(f'keypoints/{kp}', (nframes,), 'float32',
                               compression='gzip')
        h5_file[f'keypoints/{kp}'].attrs['description'] = desc

    h5_file.create_dataset('timestamps', compression='gzip',
                           data=config_data['timestamps'])
    h5_file['timestamps'].attrs['description'] = 'Depth video timestamps'

    crop_size = config_data['crop_size']
    h5_file.create_dataset('frames', (nframes, crop_size[0], crop_size[1]),
                           config_data['frame_dtype'], compression='gzip')
    h5_file['frames'].attrs['description'] = \
        '3D Numpy array of depth frames (nframes x w x h, in mm)'

    if config_data.get('use_tracking_model', False):
        h5_file.create_dataset('frames_mask', (nframes, crop_size[0], crop_size[1]),
                               'float32', compression='gzip')
        h5_file['frames_mask'].attrs['description'] = \
            'Log-likelihood values from the tracking model (nframes x w x h)'
    else:
        h5_file.create_dataset('frames_mask', (nframes, crop_size[0], crop_size[1]),
                               'bool', compression='gzip')
        h5_file['frames_mask'].attrs['description'] = \
            'Boolean mask, false=not mouse, true=mouse'

    if config_data.get('flip_classifier') is not None:
        h5_file.create_dataset('metadata/extraction/flips', (nframes,), 'bool',
                               compression='gzip')
        h5_file['metadata/extraction/flips'].attrs['description'] = \
            'Output from flip classifier, false=no flip, true=flip'

    h5_file.create_dataset('metadata/extraction/true_depth',
                           data=config_data['true_depth'])
    h5_file['metadata/extraction/true_depth'].attrs['description'] = \
        'Detected true depth of arena floor in mm'

    h5_file.create_dataset('metadata/extraction/roi',
                           data=np.asarray(config_data['roi']), compression='gzip')
    h5_file['metadata/extraction/roi'].attrs['description'] = 'ROI mask'

    h5_file.create_dataset('metadata/extraction/first_frame',
                           data=np.asarray(config_data['first_frame']),
                           compression='gzip')
    h5_file['metadata/extraction/first_frame'].attrs['description'] = \
        'First frame of depth dataset'

    h5_file.create_dataset('metadata/extraction/background',
                           data=np.asarray(config_data['bground_im']),
                           compression='gzip')
    h5_file['metadata/extraction/background'].attrs['description'] = \
        'Computed background image'

    extract_version = f'moseq2-detectron-extract-tpu v{__version__}'
    h5_file.create_dataset('metadata/extraction/extract_version', data=extract_version)
    h5_file['metadata/extraction/extract_version'].attrs['description'] = \
        'Version of moseq2-extract'

    dict_to_h5(h5_file, status_dict.get('parameters', {}),
               'metadata/extraction/parameters', param_annotations)

    for key, value in status_dict.get('metadata', {}).items():
        if isinstance(value, list) and len(value) > 0 and isinstance(value[0], str):
            value = [n.encode('utf8') for n in value]
        if value is not None:
            h5_file.create_dataset(f'metadata/acquisition/{key}', data=value)
        else:
            h5_file.create_dataset(f'metadata/acquisition/{key}', dtype='f')


def write_extracted_chunk_to_h5(h5_file: h5py.File, results: dict) -> None:
    '''Write one chunk of results, honoring the chunk-overlap offset
    (m2de/io/result.py:106-130).'''
    frame_range = results['frame_idxs']
    offset = results['offset']

    for scalar, values in results['scalars'].items():
        h5_file[f'scalars/{scalar}'][frame_range] = values[offset:]

    h5_file['frames'][frame_range] = results['depth_frames'][offset:]
    h5_file['frames_mask'][frame_range] = results['mask_frames'][offset:]

    if 'metadata/extraction/flips' in h5_file:
        h5_file['metadata/extraction/flips'][frame_range] = \
            results['features']['flips'][offset:]

    for kp, values in results['keypoints'].items():
        h5_file[f'keypoints/{kp}'][frame_range] = values[offset:]


def copy_frame(h5_file: h5py.File, src_frame: int, dst_frame: int) -> None:
    '''Copy all per-frame data between indices (m2de/io/result.py:133-159).'''
    h5_file['frames'][dst_frame] = h5_file['frames'][src_frame]
    h5_file['frames_mask'][dst_frame] = h5_file['frames_mask'][src_frame]
    for base in ['/scalars', '/keypoints/reference', '/keypoints/rotated']:
        for key in h5_file[base].keys():
            h5_file[f'{base}/{key}'][dst_frame] = h5_file[f'{base}/{key}'][src_frame]
    flip_keys = [f'/metadata/extraction/{key}'
                 for key in h5_file['/metadata/extraction'].keys()
                 if key.startswith('flips')]
    for key in flip_keys:
        h5_file[key][dst_frame] = h5_file[key][src_frame]


def trim_results(h5_file: Union[str, h5py.File], start: int, stop: int) -> None:
    '''Truncate all non-metadata datasets (plus flips) to [start, stop)
    (m2de/io/result.py:162-199). Datasets are recreated at the new length.'''
    h5: h5py.File
    need_to_close = False
    if isinstance(h5_file, (str, os.PathLike)):
        h5 = h5py.File(h5_file, mode='r+')
        need_to_close = True
    elif isinstance(h5_file, h5py.File):
        h5 = h5_file
        if h5.mode != 'r+':
            raise ValueError('results file must be opened writable')
    else:
        raise ValueError(f'expected path or h5py.File, got {type(h5_file)}')

    to_trim = []

    def _visit(name, node):
        if isinstance(node, h5py.Dataset) and ('flips' in name or 'metadata' not in name):
            if node.ndim >= 1 and node.shape[0] >= stop:
                to_trim.append(name)

    h5.visititems(_visit)
    for name in to_trim:
        node = h5[name]
        data = node[start:stop]
        attrs = dict(node.attrs)
        dtype = node.dtype
        del h5[name]
        h5.create_dataset(name, data=data, dtype=dtype, compression='gzip')
        for k, v in attrs.items():
            h5[name].attrs[k] = v
    h5.flush()
    if need_to_close:
        h5.close()
