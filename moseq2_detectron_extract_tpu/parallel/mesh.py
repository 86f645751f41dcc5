'''Device mesh construction helpers.'''
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis_name: str = 'data',
              devices: Optional[Sequence] = None) -> Mesh:
    '''A 1-D mesh over the first ``n_devices`` local devices.

    Extraction and data-parallel training both scale along one axis; richer
    (tp/pp) layouts are unnecessary for a 62M-parameter detector, where pure
    DP is the optimal sharding at every practical batch size.
    '''
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
