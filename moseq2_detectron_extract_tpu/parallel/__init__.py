'''Multi-chip scaling: device meshes, data-parallel training, session sharding.

The reference has no in-repo distributed compute (SURVEY.md §2.2: SLURM job
per session only). The TPU-native equivalents:
- training: data parallelism over a ``jax.sharding.Mesh`` — batch sharded on
  the 'data' axis, params replicated, gradient all-reduce compiled in by XLA;
- extraction: sessions are embarrassingly parallel — shard sessions across
  the chips of a slice (the v5e-8 multi-session configuration).
'''
from moseq2_detectron_extract_tpu.parallel.mesh import make_mesh
from moseq2_detectron_extract_tpu.parallel.data_parallel import (make_dp_train_step,
                                                                 replicate_state,
                                                                 shard_batch)
from moseq2_detectron_extract_tpu.parallel.sessions import extract_sessions_sharded

__all__ = ['make_mesh', 'make_dp_train_step', 'replicate_state', 'shard_batch',
           'extract_sessions_sharded']
