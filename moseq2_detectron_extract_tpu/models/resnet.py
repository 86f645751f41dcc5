'''ResNet-50 backbone in flax.linen (NHWC, bf16-friendly).

Replaces the Detectron2 ResNet selected by the reference's config
(m2de/model/config.py:30, R50 with FrozenBN, FREEZE_AT=0). FrozenBN is an
affine channel transform with stored statistics — here a ``FrozenBatchNorm``
module whose variables live in a separate ``batch_stats``-like collection so
the optimizer can exclude them.
'''
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    '''BatchNorm with frozen statistics: y = (x - mean) / sqrt(var + eps) * w + b.

    All four tensors are parameters initialized to identity; they train only
    if the optimizer chooses to (the reference keeps them frozen).

    The affine constants fold in f32, then cast to ``dtype`` so a bf16
    residual stream STAYS bf16 — without the cast, f32 params promote every
    activation back to f32 and the whole "bf16 backbone" silently runs f32
    (measured ~7.5% backbone MFU before the fix).
    '''
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        mean = self.param('mean', nn.initializers.zeros, (c,))
        var = self.param('var', nn.initializers.ones, (c,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv.astype(self.dtype) + (bias - mean * inv).astype(self.dtype)


def _norm_layer(norm: str, dtype: jnp.dtype = jnp.float32):
    if norm == 'frozen_bn':
        return FrozenBatchNorm(dtype=dtype)
    if norm == 'gn':
        # torch GN eps; flax computes the statistics in >=f32 regardless of
        # the compute dtype, so bf16 here only affects the affine output
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype)
    raise ValueError(f'unknown norm {norm}')


class Bottleneck(nn.Module):
    '''1x1 -> 3x3 -> 1x1 bottleneck block with projection shortcut on stride
    or channel change.'''
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    norm: str = 'frozen_bn'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name='shortcut')(x)
            shortcut = _norm_layer(self.norm, self.dtype)(shortcut)

        y = nn.Conv(self.bottleneck_channels, (1, 1), strides=self.stride,
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        y = _norm_layer(self.norm, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.bottleneck_channels, (3, 3), padding=1,
                    use_bias=False, dtype=self.dtype, name='conv2')(y)
        y = _norm_layer(self.norm, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(y)
        y = _norm_layer(self.norm, self.dtype)(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    '''ResNet with C2..C5 feature outputs (strides 4, 8, 16, 32).

    ``stage_blocks``/``width`` allow scaled-down variants for tests and
    CPU dry runs; defaults give the standard R50/R101.
    '''
    depth: int = 50
    norm: str = 'frozen_bn'
    stage_blocks: Optional[Tuple[int, int, int, int]] = None
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.stage_blocks is not None:
            stage_blocks: Sequence[int] = self.stage_blocks
        elif self.depth == 50:
            stage_blocks = (3, 4, 6, 3)
        elif self.depth == 101:
            stage_blocks = (3, 4, 23, 3)
        else:
            raise ValueError(f'unsupported resnet depth {self.depth}')

        # stem: 7x7/2 + maxpool/2
        w = self.width
        y = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name='stem_conv')(x)
        y = _norm_layer(self.norm, self.dtype)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = {}
        channels = (w * 4, w * 8, w * 16, w * 32)
        bottleneck = (w, w * 2, w * 4, w * 8)
        for stage, (nblocks, out_c, mid_c) in enumerate(zip(stage_blocks, channels,
                                                            bottleneck)):
            stride = 1 if stage == 0 else 2
            for block in range(nblocks):
                y = Bottleneck(out_c, mid_c, stride=stride if block == 0 else 1,
                               norm=self.norm, dtype=self.dtype,
                               name=f'res{stage + 2}_{block}')(y)
            outputs[f'res{stage + 2}'] = y
        return outputs
