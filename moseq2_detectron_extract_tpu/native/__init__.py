'''Native (C++) runtime components, loaded via ctypes.

Shared libraries build on first use with the system compiler and cache next
to the source; everything has a pure-numpy fallback so the package works
without a toolchain.
'''
import ctypes
import logging
import os
import subprocess
import threading
from typing import Callable, Dict, Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()
_libs: Dict[str, Optional[ctypes.CDLL]] = {}


def _build(src_path: str, lib_path: str) -> bool:
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           src_path, '-o', lib_path]
    try:
        result = subprocess.run(cmd, capture_output=True, timeout=120, check=False)
        if result.returncode != 0:
            # -march=native can fail on exotic hosts; retry generic
            cmd.remove('-march=native')
            result = subprocess.run(cmd, capture_output=True, timeout=120,
                                    check=False)
        if result.returncode != 0:
            logging.warning('native build of %s failed: %s', src_path,
                            result.stderr.decode()[:500])
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as exc:
        logging.warning('native build unavailable: %s', exc)
        return False


def _host_fingerprint() -> str:
    '''CPU-ISA identity of this host: -march=native binaries built on a
    different machine (shared checkout, copied image) would SIGILL with no
    chance of a python-level fallback, so builds are keyed on this.'''
    import hashlib
    import platform
    flags = ''
    try:
        with open('/proc/cpuinfo', encoding='utf-8') as fh:
            for line in fh:
                if line.startswith(('flags', 'Features')):
                    flags = line
                    break
    except OSError:
        pass
    return hashlib.sha256(
        (platform.machine() + flags).encode()).hexdigest()[:16]


def _load_lib(src_name: str, lib_name: str,
              configure: Callable[[ctypes.CDLL], None]) -> Optional[ctypes.CDLL]:
    '''Load (building if stale/missing) a native library, or None.'''
    with _lock:
        if lib_name in _libs:
            return _libs[lib_name]
        src_path = os.path.join(_DIR, src_name)
        lib_path = os.path.join(_DIR, lib_name)
        host_path = lib_path + '.host'
        fingerprint = _host_fingerprint()
        try:
            built_for = open(host_path, encoding='utf-8').read().strip()
        except OSError:
            built_for = ''
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src_path)
                or built_for != fingerprint):
            if not _build(src_path, lib_path):
                _libs[lib_name] = None
                return None
            try:
                with open(host_path, 'w', encoding='utf-8') as fh:
                    fh.write(fingerprint)
            except OSError:
                pass
        try:
            lib = ctypes.CDLL(lib_path)
            configure(lib)
        except OSError as exc:
            logging.warning('could not load %s: %s', lib_name, exc)
            _libs[lib_name] = None
            return None
        _libs[lib_name] = lib
        return lib


def _configure_kalman(lib: ctypes.CDLL) -> None:
    d = ctypes.POINTER(ctypes.c_double)
    u8 = ctypes.POINTER(ctypes.c_ubyte)
    i = ctypes.c_int
    lib.kalman_filter_native.argtypes = [d, d, d, d, d, d, d, u8,
                                         i, i, i, d, d, d, d]
    lib.kalman_filter_native.restype = i
    lib.kalman_smooth_native.argtypes = [d, d, d, d, d, i, i, d, d, d]
    lib.kalman_smooth_native.restype = i


def _configure_prep(lib: ctypes.CDLL) -> None:
    u8 = ctypes.POINTER(ctypes.c_ubyte)
    i32 = ctypes.POINTER(ctypes.c_int32)
    i = ctypes.c_int
    l = ctypes.c_long
    lib.prep_frames_native.argtypes = [u8, l, l, i32, i32, l, l, l,
                                       i, i, i, i, i, u8]
    lib.prep_frames_native.restype = i


def load_kalman_lib() -> Optional[ctypes.CDLL]:
    '''The f64 Kalman filter/smoother core (kalman_native.cpp).'''
    return _load_lib('kalman_native.cpp', 'libkalman.so', _configure_kalman)


def load_prep_lib() -> Optional[ctypes.CDLL]:
    '''The one-pass depth-frame prep core (prep_native.cpp).'''
    return _load_lib('prep_native.cpp', 'libprep.so', _configure_prep)
