'''Multi-session extraction sharded across local devices.

The extraction workload is embarrassingly parallel per session (the reference
scaled out with one SLURM job per session, m2de/cli.py:822-863). On a TPU
slice we instead pin each session's inference step to its own chip and run
the host pipelines concurrently on threads — the BASELINE.json v5e-8
multi-session configuration.
'''
import logging
import threading
from typing import Dict, List, Optional, Sequence

import jax


def extract_sessions_sharded(session_paths: Sequence[str], config: dict,
                             devices: Optional[Sequence] = None,
                             max_concurrent: Optional[int] = None) -> Dict[str, str]:
    '''Extract several sessions concurrently, one device per session.

    Returns {session_path: status_yaml_path}. ``config`` is the extract config
    dict (a copy is made per session; output dirs default next to each
    session).
    '''
    from copy import deepcopy

    from moseq2_detectron_extract_tpu.extract import extract_session
    from moseq2_detectron_extract_tpu.io.session import Session

    if devices is None:
        devices = jax.local_devices()
    max_concurrent = max_concurrent or len(devices)
    results: Dict[str, str] = {}
    lock = threading.Lock()
    sem = threading.Semaphore(max_concurrent)

    def run_one(idx: int, path: str):
        with sem:
            device = devices[idx % len(devices)]
            session_config = deepcopy(
                {k: v for k, v in config.items() if k != 'predictor'})
            session_config['output_dir'] = None
            session_config['device'] = device
            if 'predictor' in config:
                session_config['predictor'] = config['predictor']
            try:
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
