'''Training state, LR schedule, and jitted train step.

Solver parity with m2de/model/config.py:60-68: SGD momentum 0.9, base LR
2.5e-3, warmup, step decay (70k, 80k, 90k) gamma 0.05, bf16 compute (AMP),
100k iterations, checkpoints every 5k. FrozenBN statistics are excluded from
optimization via an optax mask.
'''
import functools
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


def zero_nonfinite() -> optax.GradientTransformation:
    '''Zero every non-finite gradient value (NaN AND +/-inf).

    optax.zero_nans() passes inf through; a single inf grad (bf16 overflow)
    then drives clip_by_global_norm's scale to clip/inf = 0 and inf * 0 = NaN
    poisons the params permanently (observed: prod-config run NaN'd within
    250 steps). AMP grad-scaler equivalent: skip the bad values, keep the run.
    '''
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: ModelConfig, params) -> optax.GradientTransformation:
    '''SGD + momentum + weight decay with LR schedule, global-norm clipping,
    and frozen-stat mask.'''
    # a single inf/nan grad (bf16 overflow) must not poison the run —
    # the bad values are skipped for that step (see zero_nonfinite)
    steps = [zero_nonfinite()]
    if cfg.grad_clip_norm:
        steps.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    steps += [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=lr_schedule(cfg), momentum=cfg.momentum),
    ]
    # NOT optax.masked: masked() passes the RAW GRADIENT through unchanged
    # for masked-out leaves, so apply_updates would train the "frozen" BN
    # statistics at an effective LR of 1.0 — observed driving a var negative
    # (sqrt(var+eps) -> NaN) within ~170 prod-config steps. Frozen leaves
    # must get a hard zero update.
    labels = jax.tree_util.tree_map(
        lambda trainable: 'trainable' if trainable else 'frozen',
        _trainable_mask(params))
    return optax.multi_transform(
        {'trainable': optax.chain(*steps), 'frozen': optax.set_to_zero()},
        labels)


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

    # donate the state: params + optimizer buffers update in place in HBM
    # instead of holding old+new copies live across the step
    @functools.partial(jax.jit, donate_argnums=(0,))
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
