'''Data-parallel training over a device mesh.

Batch is sharded on the 'data' mesh axis; params/optimizer state are
replicated. Under ``jit`` with these shardings XLA compiles the gradient
all-reduce (psum over ICI) automatically — the TPU-native replacement for the
DDP/NCCL stack the reference never had (SURVEY.md §5 "distributed
communication backend").
'''
from typing import Any, Dict, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moseq2_detectron_extract_tpu.models.augment import augment_batch
from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN
from moseq2_detectron_extract_tpu.models.train import (TrainState, lr_schedule,
                                                       make_optimizer)


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis_name: str = 'data'):
    '''Place a host batch with its leading axis sharded over the mesh.'''
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    '''Replicate params/opt state across the mesh.'''
    replicated = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, replicated), state)


def make_dp_train_step(cfg: ModelConfig, mesh: Mesh, axis_name: str = 'data'):
    '''Build the jitted data-parallel train step (augment + loss + SGD).

    The returned function takes (state, batch, rng) where ``batch`` holds the
    raw host tensors of models/data.py (image/masks/keypoints/valid) with
    batch size divisible by the mesh size.
    '''
    model = MaskKeypointRCNN(cfg)
    import jax.numpy as jnp
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    template_params = jax.eval_shape(
        lambda r: model.init(r, dummy, method=MaskKeypointRCNN.inference),
        jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, template_params)

    batch_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def loss_fn(params, images, gt, rng):
        losses = model.apply(params, images, gt, rng,
                             method=MaskKeypointRCNN.losses)
        return losses['total_loss'], losses

    def step_fn(state: TrainState, batch: Dict[str, Any], rng
                ) -> Tuple[TrainState, Dict]:
        aug_rng, loss_rng = jax.random.split(rng)
        images, gt = augment_batch(aug_rng, batch['image'], batch['masks'],
                                   batch['keypoints'], batch['valid'], cfg)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, gt, loss_rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics['lr'] = lr_schedule(cfg)(state.step)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state), metrics

    batch_spec = {'image': batch_sharding, 'masks': batch_sharding,
                  'keypoints': batch_sharding, 'valid': batch_sharding}
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_spec, replicated),
        out_shardings=(None, None),
        donate_argnums=(0,),
    )
