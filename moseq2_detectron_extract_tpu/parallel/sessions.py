'''Multi-session extraction sharded across local devices.

The extraction workload is embarrassingly parallel per session (the reference
scaled out with one SLURM job per session, m2de/cli.py:822-863). On a TPU
slice we instead pin each session's model params (and therefore its jitted
inference programs) to its own chip and run the host pipelines concurrently
on threads — the BASELINE.json v5e-8 multi-session configuration.

Placement works by committing a copy of the params to each device
(`Predictor.to_device`): jit places a program on the device of its committed
arguments, so each session's whole inference path runs on its own chip with
no cross-device traffic. `jax.default_device` alone would NOT do this — it
never moves committed arrays, so every session would silently follow the
shared params to device 0.
'''
import logging
import threading
from typing import Dict, Optional, Sequence

import jax


def _build_device_predictors(config: dict, devices) -> list:
    '''One Predictor per device, params committed to that device.

    The base params are loaded (or taken from config['predictor']) once on
    host and device_put per device — model weights transfer once per chip.
    '''
    from moseq2_detectron_extract_tpu.models.predictor import Predictor

    base = config.get('predictor')
    if base is None:
        base = Predictor.from_model_dir(
            config['model'], checkpoint=config.get('checkpoint', 'last'),
            batch_size=config.get('batch_size', 10),
            score_threshold=config.get('instance_threshold'))
    return [base.to_device(dev) for dev in devices]


def extract_sessions_sharded(session_paths: Sequence[str], config: dict,
                             devices: Optional[Sequence] = None,
                             max_concurrent: Optional[int] = None) -> Dict[str, str]:
    '''Extract several sessions concurrently, one device per session.

    Returns {session_path: status_yaml_path}. ``config`` is the extract config
    dict (a copy is made per session; output dirs default next to each
    session). Sessions beyond ``len(devices)`` round-robin onto the devices;
    ``max_concurrent`` bounds simultaneously running pipelines (default: one
    per device).
    '''
    from copy import deepcopy

    from moseq2_detectron_extract_tpu.extract import extract_session
    from moseq2_detectron_extract_tpu.io.session import Session

    if devices is None:
        devices = jax.local_devices()
    max_concurrent = max_concurrent or len(devices)
    predictors = _build_device_predictors(config, devices)
    results: Dict[str, str] = {}
    lock = threading.Lock()
    sem = threading.Semaphore(max_concurrent)

    def run_one(idx: int, path: str):
        with sem:
            device = devices[idx % len(devices)]
            session_config = deepcopy(
                {k: v for k, v in config.items()
                 if k not in ('predictor', 'output_dir')})
            session_config['output_dir'] = None
            session_config['device'] = device
            session_config['predictor'] = predictors[idx % len(devices)]
            try:
                # default_device steers the non-predictor device work (prep,
                # feature ops) of this thread; the predictor's committed
                # params pin the model itself.
                with jax.default_device(device):
                    session = Session(path, frame_trim=session_config.get(
                        'frame_trim', (0, 0)))
                    status = extract_session(session, session_config)
                with lock:
                    results[path] = status
            except Exception:  # noqa: BLE001
                logging.error('session %s failed', path, exc_info=True)

    threads = [threading.Thread(target=run_one, args=(i, p), daemon=True)
               for i, p in enumerate(session_paths)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results
