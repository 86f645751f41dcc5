'''Trainer: the reference's DefaultTrainer equivalent
(m2de/model/model.py:21-74) driving the jitted train step.

Hooks parity: periodic checkpointing (5k), validation-loss eval (LossEvalHook,
m2de/model/hooks.py:22-90), device memory stats (MemoryUsageHook,
m2de/model/hooks.py:12-19), scalar metrics logged to jsonl (tensorboard-free
metrics writer).
'''
import json
import logging
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from moseq2_detectron_extract_tpu.io.annot import DataItem, dataset_catalog_get
from moseq2_detectron_extract_tpu.io.util import ensure_dir
from moseq2_detectron_extract_tpu.models.augment import augment_batch
from moseq2_detectron_extract_tpu.models.checkpoint import (get_last_checkpoint,
                                                            load_checkpoint,
                                                            save_checkpoint)
from moseq2_detectron_extract_tpu.models.config import ModelConfig
from moseq2_detectron_extract_tpu.models.data import TrainLoader, eval_batches
from moseq2_detectron_extract_tpu.models.train import (TrainState, create_train_state,
                                                       make_eval_loss_step,
                                                       make_train_step)


class MetricsWriter:
    '''Append-only jsonl scalar metrics (readable by tensorboard loaders or
    plain pandas).'''

    def __init__(self, path: str):
        self.path = path

    def write(self, step: int, metrics: dict) -> None:
        '''Append one metrics row.'''
        row = {'step': int(step)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        with open(self.path, 'a', encoding='utf-8') as fh:
            fh.write(json.dumps(row) + '\n')


def device_memory_stats() -> dict:
    '''Per-device HBM usage (MemoryUsageHook parity for TPU).'''
    out = {}
    for i, dev in enumerate(jax.local_devices()):
        try:
            stats = dev.memory_stats()
            if stats:
                out[f'device{i}_bytes_in_use'] = stats.get('bytes_in_use', 0)
        except Exception:  # noqa: BLE001
            pass
    return out


class Trainer:
    '''Single-host training loop; multi-chip data parallelism plugs in via
    parallel/data_parallel.py.'''

    def __init__(self, cfg: ModelConfig, model_dir: str,
                 train_items: Optional[Sequence[DataItem]] = None,
                 test_items: Optional[Sequence[DataItem]] = None,
                 log_period: int = 20):
        self.cfg = cfg
        self.model_dir = ensure_dir(model_dir)
        self.train_items = list(train_items) if train_items is not None \
            else dataset_catalog_get('moseq_train')
        self.test_items = list(test_items) if test_items is not None \
            else dataset_catalog_get('moseq_test')
        self.metrics = MetricsWriter(os.path.join(model_dir, 'metrics.jsonl'))
        self.log_period = log_period
        self.state: Optional[TrainState] = None
        self._train_step = make_train_step(cfg)
        self._eval_step = make_eval_loss_step(cfg)
        self._aug_jit = jax.jit(lambda key, b: augment_batch(
            key, b['image'], b['masks'], b['keypoints'], b['valid'], cfg))

    def resume_or_load(self, resume: bool = False) -> None:
        '''Initialize params, restoring the latest checkpoint when resuming.'''
        rng = jax.random.PRNGKey(0)
        self.state = create_train_state(self.cfg, rng)
        if resume:
            ckpt = get_last_checkpoint(self.model_dir)
            if ckpt is not None:
                logging.info('Resuming from %s', ckpt)
                restored = load_checkpoint(ckpt, template=self.state._asdict())
                self.state = TrainState(**restored)

    def train(self) -> TrainState:
        '''Run the solver schedule to cfg.max_iter.'''
        assert self.state is not None, 'call resume_or_load() first'
        cfg = self.cfg
        loader = TrainLoader(self.train_items, cfg)
        rng = jax.random.PRNGKey(int(np.asarray(self.state.step)) + 1)

        start_step = int(np.asarray(self.state.step))
        logging.info('Starting training at iteration %d / %d', start_step, cfg.max_iter)
        t_last = time.time()
        try:
            for step in range(start_step, cfg.max_iter):
                rng, aug_key, step_key = jax.random.split(rng, 3)
                batch = next(loader)
                images, gt = self._aug_jit(aug_key, batch)
                self.state, metrics = self._train_step(
                    self.state, {'images': images, 'gt': gt}, step_key)

                if (step + 1) % self.log_period == 0:
                    metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
                    elapsed = time.time() - t_last
                    t_last = time.time()
                    metrics['iters_per_sec'] = self.log_period / max(elapsed, 1e-9)
                    metrics.update(device_memory_stats())
                    self.metrics.write(step + 1, metrics)
                    logging.info('iter %d: total_loss=%.4f lr=%.5f (%.2f it/s)',
                                 step + 1, metrics.get('total_loss', float('nan')),
                                 metrics.get('lr', float('nan')),
                                 metrics['iters_per_sec'])

                if (step + 1) % cfg.eval_period == 0 and self.test_items:
                    self._run_validation(step + 1, rng)

                if (step + 1) % cfg.checkpoint_period == 0 or (step + 1) == cfg.max_iter:
                    path = save_checkpoint(self.model_dir, step + 1,
                                           self.state._asdict())
                    logging.info('Saved checkpoint %s', path)
        finally:
            loader.close()
        return self.state

    def _run_validation(self, step: int, rng) -> None:
        '''Mean validation loss over the test split (LossEvalHook parity).'''
        losses = []
        for batch in eval_batches(self.test_items, self.cfg):
            rng, aug_key, eval_key = jax.random.split(rng, 3)
            images, gt = self._aug_jit(aug_key, batch)
            out = self._eval_step(self.state.params,
                                  {'images': images, 'gt': gt}, eval_key)
            losses.append(float(np.asarray(out['total_loss'])))
        mean_loss = float(np.mean(losses)) if losses else float('nan')
        self.metrics.write(step, {'validation_loss': mean_loss})
        logging.info('iter %d: validation_loss=%.4f', step, mean_loss)
