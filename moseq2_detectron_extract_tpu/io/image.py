'''TIFF/image io with intensity scale-factor round-trip.

Parity target: m2de/io/image.py:13-119. Depth images (float mm values) are
stored as uint16 TIFFs with the linear scale recorded in the image description
so reads can restore original intensities.
'''
import json
import os
from typing import Optional, Tuple, Union

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except ImportError:  # pragma: no cover
    HAS_CV2 = False

_SCALE_SIDECAR_SUFFIX = '.scale.json'


def write_image(filename: str, image: np.ndarray, scale: bool = True,
                scale_factor: Optional[Union[Tuple[float, float], float]] = None,
                dtype: str = 'uint16') -> None:
    '''Write ``image`` to ``filename`` scaling intensities into ``dtype`` range.

    The (vmin, vmax) used for scaling is stored in a json sidecar so that
    :func:`read_tiff_image` can invert the transform.
    '''
    image = np.asarray(image)
    info = np.iinfo(dtype)

    if scale:
        if scale_factor is None:
            vmin, vmax = float(np.nanmin(image)), float(np.nanmax(image))
            if vmax <= vmin:
                vmax = vmin + 1.0
        elif isinstance(scale_factor, (int, float)):
            vmin, vmax = 0.0, float(scale_factor)
        else:
            vmin, vmax = float(scale_factor[0]), float(scale_factor[1])
        scaled = (image.astype('float64') - vmin) / (vmax - vmin)
        scaled = np.clip(scaled, 0.0, 1.0) * (info.max - info.min) + info.min
        out = scaled.astype(dtype)
        meta = {'scaled': True, 'vmin': vmin, 'vmax': vmax, 'dtype': str(dtype)}
    else:
        out = image.astype(dtype)
        meta = {'scaled': False, 'vmin': 0.0, 'vmax': float(info.max), 'dtype': str(dtype)}

    if HAS_CV2:
        cv2.imwrite(filename, out)
    else:  # pragma: no cover
        from PIL import Image
        Image.fromarray(out).save(filename)

    with open(filename + _SCALE_SIDECAR_SUFFIX, 'w', encoding='utf-8') as fh:
        json.dump(meta, fh)


def read_tiff_image(filename: str, scale: bool = True) -> np.ndarray:
    '''Read a TIFF written by :func:`write_image`, restoring intensities.'''
    if HAS_CV2:
        raw = cv2.imread(filename, cv2.IMREAD_UNCHANGED)
    else:  # pragma: no cover
        from PIL import Image
        raw = np.asarray(Image.open(filename))
    if raw is None:
        raise FileNotFoundError(filename)

    sidecar = filename + _SCALE_SIDECAR_SUFFIX
    if scale and os.path.exists(sidecar):
        with open(sidecar, 'r', encoding='utf-8') as fh:
            meta = json.load(fh)
        if meta.get('scaled', False):
            info = np.iinfo(meta['dtype'])
            frac = (raw.astype('float64') - info.min) / (info.max - info.min)
            return frac * (meta['vmax'] - meta['vmin']) + meta['vmin']
    return raw


def read_image(filename: str, scale: bool = True) -> np.ndarray:
    '''Generic image read (PNG etc), optionally applying the scale sidecar.'''
    return read_tiff_image(filename, scale=scale)
