'''Checkpoint management (orbax) with the reference's model-dir layout.

Parity: m2de/model/util.py:15-42 — a model dir holds ``config.yaml``, numbered
checkpoints, and a ``last_checkpoint`` pointer file.
'''
import os
import re
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

from moseq2_detectron_extract_tpu.io.util import ensure_dir
from moseq2_detectron_extract_tpu.models.config import ModelConfig

_CKPT_RE = re.compile(r'^model_(\d+)$')


def checkpoint_dir(model_dir: str) -> str:
    '''Directory holding numbered checkpoints.'''
    return os.path.join(model_dir, 'checkpoints')


def save_checkpoint(model_dir: str, step: int, state: Any) -> str:
    '''Save a pytree checkpoint as ``checkpoints/model_<step>`` and update
    ``last_checkpoint``.'''
    ckpt_root = ensure_dir(checkpoint_dir(model_dir))
    path = os.path.abspath(os.path.join(ckpt_root, f'model_{step:07d}'))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    with open(os.path.join(model_dir, 'last_checkpoint'), 'w', encoding='utf-8') as fh:
        fh.write(os.path.basename(path))
    return path


def get_last_checkpoint(model_dir: str) -> Optional[str]:
    '''Resolve the latest checkpoint path via the ``last_checkpoint`` file,
    falling back to the highest-numbered checkpoint present.'''
    pointer = os.path.join(model_dir, 'last_checkpoint')
    if os.path.exists(pointer):
        with open(pointer, 'r', encoding='utf-8') as fh:
            name = fh.read().strip()
        path = os.path.join(checkpoint_dir(model_dir), name)
        if os.path.exists(path):
            return path
    root = checkpoint_dir(model_dir)
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        m = _CKPT_RE.match(name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])


def get_checkpoint(model_dir: str, checkpoint: str = 'last') -> Optional[str]:
    '''Resolve 'last' or a specific step number to a checkpoint path
    (m2de/model/util.py:30-42).'''
    if checkpoint == 'last':
        return get_last_checkpoint(model_dir)
    step = int(checkpoint)
    path = os.path.join(checkpoint_dir(model_dir), f'model_{step:07d}')
    return path if os.path.exists(path) else None


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    '''Restore a pytree checkpoint (optionally shaped like ``template``).'''
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), item=template)
        return ckptr.restore(os.path.abspath(path))


def save_params_npz(path: str, params: Any, dtype: str = 'float16') -> None:
    '''Flatten a params pytree into a compressed npz ('/'-joined keys).

    float16 halves the artifact size vs the orbax f32 layout — the committed
    benchmark checkpoint rides in the git repo, so size matters more than the
    last mantissa bits (weights are O(1) post-training; fp16's 10-bit
    mantissa loses ~1e-4 relative, invisible at detection thresholds).
    '''
    import jax
    import numpy as np
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = '/'.join(str(getattr(k, 'key', k)) for k in keypath)
        flat[name] = np.asarray(leaf).astype(dtype)
    np.savez_compressed(path, **flat)


def load_params_npz(path: str) -> Any:
    '''Inverse of :func:`save_params_npz`: nested dict of float32 arrays.'''
    import numpy as np
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        node = tree
        parts = key.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key].astype(np.float32)
    return tree


def load_model_dir(model_dir: str, checkpoint: str = 'last'
                   ) -> Tuple[ModelConfig, Any, Optional[int]]:
    '''Load (config, params, step) from a model dir.

    A model dir normally holds orbax checkpoints; a dir carrying a
    ``params_f16.npz`` (the compact committed-artifact layout written by
    :func:`save_params_npz`) loads through the same interface.
    '''
    cfg_path = os.path.join(model_dir, 'config.yaml')
    cfg = ModelConfig.from_yaml(cfg_path) if os.path.exists(cfg_path) else ModelConfig()
    npz_path = os.path.join(model_dir, 'params_f16.npz')
    if os.path.exists(npz_path) and get_checkpoint(model_dir, checkpoint) is None:
        return cfg, load_params_npz(npz_path), None
    ckpt_path = get_checkpoint(model_dir, checkpoint)
    if ckpt_path is None:
        raise FileNotFoundError(f'no checkpoint found in {model_dir}')
    restored = load_checkpoint(ckpt_path)
    params = restored.get('params', restored)
    step = restored.get('step')
    m = _CKPT_RE.match(os.path.basename(ckpt_path))
    if step is None and m:
        step = int(m.group(1))
    return cfg, params, step
