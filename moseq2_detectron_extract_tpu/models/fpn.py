'''Feature Pyramid Network with GroupNorm and avg fusion.

Matches the reference's tuned FPN (m2de/model/config.py:82-83: NORM='GN',
FUSE_TYPE='avg') over R50 C2..C5, plus P6 via stride-2 max pool on P5 for the
RPN (LastLevelMaxPool in the keypoint_rcnn_R_50_FPN config).
'''
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    '''Builds P2..P6 (strides 4..64) from C2..C5.'''
    out_channels: int = 256
    norm: str = 'gn'
    fuse_type: str = 'avg'
    dtype: jnp.dtype = jnp.float32

    def _maybe_norm(self, x, name):
        if self.norm == 'gn':
            # flax computes the group statistics in >=f32 either way
            return nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                dtype=self.dtype, name=name)(x)
        return x

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        names = ['res2', 'res3', 'res4', 'res5']
        laterals = []
        for i, name in enumerate(names):
            lat = nn.Conv(self.out_channels, (1, 1), use_bias=self.norm != 'gn',
                          dtype=self.dtype,
                          name=f'lateral{i + 2}')(bottom_up[name])
            lat = self._maybe_norm(lat, f'lateral_norm{i + 2}')
            laterals.append(lat)

        # top-down pathway
        results = [laterals[-1]]
        for lat in laterals[-2::-1]:
            top = results[0]
            up = jax.image.resize(top, lat.shape, method='nearest')
            fused = lat + up
            if self.fuse_type == 'avg':
                fused = fused / 2.0
            results.insert(0, fused)

        outputs = []
        for i, feat in enumerate(results):
            out = nn.Conv(self.out_channels, (3, 3), padding=1,
                          use_bias=self.norm != 'gn', dtype=self.dtype,
                          name=f'output{i + 2}')(feat)
            out = self._maybe_norm(out, f'output_norm{i + 2}')
            outputs.append(out)

        # P6 for RPN proposals
        p6 = nn.max_pool(outputs[-1], (1, 1), strides=(2, 2))
        outputs.append(p6)
        return tuple(outputs)  # P2, P3, P4, P5, P6
