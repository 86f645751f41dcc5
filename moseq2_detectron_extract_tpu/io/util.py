'''Host-side IO utilities: batching, yaml, h5 helpers, logging, paths.

Behavioral parity targets: m2de/io/util.py (batch sequence generation :24-35,
yaml io :85-109, dict_to_h5 :136-176, logging :179-236, path helpers :313-375,
unextracted-session scan :378-409, batch command wrappers :425-492).
'''
import json
import logging
import logging.handlers
import os
import sys
import uuid
from typing import IO, Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import h5py
import numpy as np
import yaml
from tqdm.auto import tqdm


def gen_batch_sequence(nframes: int, chunk_size: int, overlap: int = 0,
                       offset: int = 0) -> List[range]:
    '''Generate a sequence of overlapping index ranges covering ``nframes``.

    Each batch holds ``chunk_size`` indices and overlaps the previous batch by
    ``overlap`` indices (the overlap region is later discarded at write time).
    '''
    seq = range(offset, nframes + offset)
    out = []
    for i in range(offset, len(seq) + offset - overlap, chunk_size - overlap):
        block = seq[i - offset:i - offset + chunk_size]
        if len(block) > 0:
            out.append(block)
    return out


def read_yaml(path: str) -> dict:
    '''Read a yaml file into a dict.'''
    with open(path, 'r', encoding='utf-8') as fh:
        return yaml.safe_load(fh)


def write_yaml(path: str, data: dict) -> None:
    '''Write a dict to a yaml file (numpy values coerced to python).'''
    with open(path, 'w', encoding='utf-8') as fh:
        yaml.safe_dump(_sanitize_for_yaml(data), fh)


def _sanitize_for_yaml(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _sanitize_for_yaml(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_sanitize_for_yaml(v) for v in value]
    if isinstance(value, np.ndarray):
        return _sanitize_for_yaml(value.tolist())
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, (np.bool_,)):
        return bool(value)
    if isinstance(value, uuid.UUID):
        return str(value)
    return value


def dict_to_h5(h5_file: h5py.File, data: dict, root: str = '',
               annotations: Optional[Dict[str, str]] = None) -> None:
    '''Recursively write a dict into an h5 file under ``root``.

    Large numpy arrays become datasets; scalars/strings become scalar datasets.
    ``annotations`` maps keys to description attribute strings.
    '''
    if root and not root.endswith('/'):
        root = root + '/'
    if annotations is None:
        annotations = {}

    for key, value in data.items():
        dest = f'{root}{key}'
        try:
            if value is None:
                h5_file.create_dataset(dest, data=h5py.Empty('f'))
            elif isinstance(value, dict):
                dict_to_h5(h5_file, value, dest, annotations.get(key) if isinstance(annotations.get(key), dict) else None)
                continue
            elif isinstance(value, (list, tuple)):
                arr = np.asarray(value)
                if arr.dtype.kind in ('U', 'S', 'O'):
                    arr = np.array([str(v).encode('utf8') for v in value])
                h5_file.create_dataset(dest, data=arr)
            elif isinstance(value, np.ndarray):
                h5_file.create_dataset(dest, data=value)
            elif isinstance(value, (str, bytes)):
                h5_file.create_dataset(dest, data=value)
            elif isinstance(value, (bool, np.bool_)):
                h5_file.create_dataset(dest, data=bool(value))
            elif isinstance(value, (int, float, np.integer, np.floating)):
                h5_file.create_dataset(dest, data=value)
            else:
                h5_file.create_dataset(dest, data=json.dumps(value, default=str))
        except Exception:  # noqa: BLE001 - a single bad metadata value must not kill a run
            logging.warning('could not write metadata key %s', dest)
            continue

        ann = annotations.get(key)
        if isinstance(ann, str):
            h5_file[dest].attrs['description'] = ann


def load_timestamps(path_or_file: Union[str, IO[bytes]], col: int = 0) -> np.ndarray:
    '''Load timestamps from a whitespace/comma separated text file.'''
    ts = []
    if isinstance(path_or_file, (str, os.PathLike)):
        fh = open(path_or_file, 'r', encoding='utf-8')
        close = True
    else:
        fh = path_or_file
        close = False
    try:
        for raw in fh:
            if isinstance(raw, bytes):
                raw = raw.decode('utf-8')
            raw = raw.strip()
            if not raw:
                continue
            parts = raw.replace(',', ' ').split()
            ts.append(float(parts[col]))
    finally:
        if close:
            fh.close()
    return np.array(ts, dtype='float64')


def load_metadata(path_or_file: Union[str, IO[bytes]]) -> dict:
    '''Load session metadata.json.'''
    if isinstance(path_or_file, (str, os.PathLike)):
        with open(path_or_file, 'r', encoding='utf-8') as fh:
            return json.load(fh)
    return json.load(path_or_file)


def ensure_dir(path: str) -> str:
    '''Create ``path`` (and parents) if missing, tolerant to races.'''
    os.makedirs(path, exist_ok=True)
    return path


def find_unused_file_path(path: str) -> str:
    '''Return ``path`` if unused else ``stem.N.ext`` with the first free N.'''
    if not os.path.exists(path):
        return path
    stem, ext = os.path.splitext(path)
    i = 1
    while os.path.exists(f'{stem}.{i}{ext}'):
        i += 1
    return f'{stem}.{i}{ext}'


def backup_existing_file(path: str) -> Optional[str]:
    '''Rename an existing file to an unused backup name; returns the new path.'''
    if not os.path.exists(path):
        return None
    backup = find_unused_file_path(path + '.bak')
    os.rename(path, backup)
    return backup


class TqdmStreamHandler(logging.StreamHandler):
    '''Stream handler that cooperates with tqdm progress bars.'''

    def emit(self, record):
        if record.__dict__.get('nostream', False):
            return
        try:
            msg = self.format(record)
            tqdm.write(msg, file=sys.stderr)
            self.flush()
        except Exception:  # noqa: BLE001
            self.handleError(record)


_MEMORY_HANDLER: Optional[logging.handlers.MemoryHandler] = None


def setup_logging(level: int = logging.INFO, add_defered_file_handler: bool = False) -> None:
    '''Configure root logging with a tqdm-aware stream handler.

    When ``add_defered_file_handler`` is True, records are buffered in memory
    until :func:`attach_file_logger` is called so that early records reach the
    per-run log file (mirrors m2de/io/util.py:179-236).
    '''
    global _MEMORY_HANDLER

    root = logging.getLogger()
    root.setLevel(level)
    for handler in list(root.handlers):
        root.removeHandler(handler)

    stream = TqdmStreamHandler()
    stream.setFormatter(logging.Formatter('%(message)s'))
    root.addHandler(stream)

    if add_defered_file_handler:
        _MEMORY_HANDLER = logging.handlers.MemoryHandler(capacity=10000, flushLevel=logging.CRITICAL + 1)
        _MEMORY_HANDLER.setFormatter(logging.Formatter('%(asctime)s [%(levelname)s] %(message)s'))
        root.addHandler(_MEMORY_HANDLER)


def attach_file_logger(log_path: str) -> None:
    '''Attach a file handler, flushing any buffered early records into it.

    Any previously attached extraction file handler is removed first so
    back-to-back sessions in one process do not cross-log.
    '''
    global _MEMORY_HANDLER
    root = logging.getLogger()
    for handler in list(root.handlers):
        if isinstance(handler, logging.FileHandler):
            root.removeHandler(handler)
            handler.close()
    file_handler = logging.FileHandler(log_path, mode='a', encoding='utf-8')
    file_handler.setFormatter(logging.Formatter('%(asctime)s [%(levelname)s] %(message)s'))
    if _MEMORY_HANDLER is not None:
        _MEMORY_HANDLER.setTarget(file_handler)
        _MEMORY_HANDLER.flush()
        root.removeHandler(_MEMORY_HANDLER)
        _MEMORY_HANDLER.close()
        _MEMORY_HANDLER = None
    root.addHandler(file_handler)


def scan_unextracted_sessions(input_dir: str, extension: str = '.dat',
                              bg_roi_index: int = 0) -> List[str]:
    '''Find session files under ``input_dir`` lacking a completed status yaml.

    Mirrors m2de/io/util.py:378-409: a session is "extracted" when a
    ``proc/results_NN.yaml`` exists next to it with ``complete: true``.
    '''
    from moseq2_detectron_extract_tpu.proc.util import check_completion_status

    found: List[str] = []
    for root, _dirs, files in os.walk(input_dir):
        for fname in files:
            matches = fname.endswith(extension) or fname.endswith('.tar.gz') or fname.endswith('.tgz')
            if not matches:
                continue
            path = os.path.join(root, fname)
            if fname.endswith(extension):
                status = os.path.join(root, 'proc', f'results_{bg_roi_index:02d}.yaml')
            else:
                stem = fname.replace('.tar.gz', '').replace('.tgz', '')
                status = os.path.join(root, stem, 'proc', f'results_{bg_roi_index:02d}.yaml')
            if not check_completion_status(status):
                found.append(path)
    return sorted(found)


def wrap_command_with_local(commands: Sequence[str], output_path: str) -> List[str]:
    '''Wrap per-session extract commands for local sequential execution.'''
    return list(commands)


def wrap_command_with_slurm(commands: Sequence[str], prefix: Optional[str] = None,
                            partition: str = 'main', ncpus: int = 4, memory: str = '16GB',
                            wall_time: str = '3:00:00') -> List[str]:
    '''Wrap per-session extract commands in ``sbatch`` invocations.

    Mirrors m2de/io/util.py:425-476 (one SLURM job per session).
    '''
    out = []
    for cmd in commands:
        if prefix:
            cmd = f'{prefix}; {cmd}'
        wrapped = (f'sbatch --partition {partition} --cpus-per-task {ncpus} '
                   f'--mem {memory} --time {wall_time} '
                   f'--wrap "{cmd}"')
        out.append(wrapped)
    return out
