'''Training state, LR schedule, and jitted train step.

Solver parity with m2de/model/config.py:60-68: SGD momentum 0.9, base LR
2.5e-3, warmup, step decay (70k, 80k, 90k) gamma 0.05, bf16 compute (AMP),
100k iterations, checkpoints every 5k. FrozenBN statistics are excluded from
optimization via an optax mask.
'''
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN


class TrainState(NamedTuple):
    '''Carried training state (a plain pytree; orbax-serializable).'''
    step: jnp.ndarray
    params: Any
    opt_state: Any


def lr_schedule(cfg: ModelConfig):
    '''Warmup + multi-step decay schedule (Detectron2 WarmupMultiStepLR).'''
    def schedule(step):
        lr = jnp.asarray(cfg.base_lr, jnp.float32)
        for boundary in cfg.lr_steps:
            lr = jnp.where(step >= boundary, lr * cfg.lr_gamma, lr)
        warm = jnp.minimum(step / max(cfg.warmup_iters, 1), 1.0)
        factor = cfg.warmup_factor + (1.0 - cfg.warmup_factor) * warm
        return lr * factor
    return schedule


def _trainable_mask(params) -> Any:
    '''False for FrozenBatchNorm statistics/affine params, True elsewhere.'''
    frozen_keys = {'mean', 'var', 'scale', 'bias'}

    def mask_fn(path, _):
        # path is a tuple of keys; FrozenBatchNorm module params are named
        # FrozenBatchNorm_*/{scale,bias,mean,var}
        for i, key in enumerate(path):
            name = getattr(key, 'key', str(key))
            if 'FrozenBatchNorm' in str(name):
                leaf = getattr(path[-1], 'key', str(path[-1]))
                return leaf not in frozen_keys
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(cfg: ModelConfig, params) -> optax.GradientTransformation:
    '''SGD + momentum + weight decay with LR schedule, global-norm clipping,
    and frozen-stat mask.'''
    # zero_nans: a single inf/nan grad (bf16 overflow) must not poison the
    # run — the step is skipped for that tensor (AMP grad-scaler equivalent)
    steps = [optax.zero_nans()]
    if cfg.grad_clip_norm:
        steps.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    steps += [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=lr_schedule(cfg), momentum=cfg.momentum),
    ]
    return optax.masked(optax.chain(*steps), _trainable_mask(params))


def create_train_state(cfg: ModelConfig, rng) -> TrainState:
    '''Initialize model params + optimizer state.'''
    model = MaskKeypointRCNN(cfg)
    images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = model.init(rng, images, method=MaskKeypointRCNN.inference)
    tx = make_optimizer(cfg, params)
    return TrainState(step=jnp.asarray(0), params=params,
                      opt_state=tx.init(params))


def make_train_step(cfg: ModelConfig):
    '''Build the jitted (state, batch, rng) -> (state, metrics) train step.

    ``batch`` holds images (B, S, S, 3) float32 normalized + the gt dict of
    :meth:`MaskKeypointRCNN.losses`.
    '''
    model = MaskKeypointRCNN(cfg)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    template_params = jax.eval_shape(
        lambda r: model.init(r, dummy, method=MaskKeypointRCNN.inference),
        jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, template_params)

    def loss_fn(params, images, gt, rng):
        losses = model.apply(params, images, gt, rng,
                             method=MaskKeypointRCNN.losses)
        return losses['total_loss'], losses

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, Any], rng) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch['images'], batch['gt'], rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics['lr'] = lr_schedule(cfg)(state.step)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state), metrics

    return train_step


def make_eval_loss_step(cfg: ModelConfig):
    '''Jitted validation-loss computation (LossEvalHook parity,
    m2de/model/hooks.py:22-90).'''
    model = MaskKeypointRCNN(cfg)

    @jax.jit
    def eval_step(params, batch, rng):
        return model.apply(params, batch['images'], batch['gt'], rng,
                           method=MaskKeypointRCNN.losses)

    return eval_step
