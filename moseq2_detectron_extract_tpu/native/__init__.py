'''Native (C++) runtime components, loaded via ctypes.

The shared library builds on first use with the system compiler and caches
next to the source; everything has a pure-numpy fallback so the package works
without a toolchain.
'''
import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libkalman.so')
_SRC_PATH = os.path.join(_DIR, 'kalman_native.cpp')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           _SRC_PATH, '-o', _LIB_PATH]
    try:
        result = subprocess.run(cmd, capture_output=True, timeout=120, check=False)
        if result.returncode != 0:
            logging.warning('native kalman build failed: %s',
                            result.stderr.decode()[:500])
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as exc:
        logging.warning('native kalman build unavailable: %s', exc)
        return False


def load_kalman_lib() -> Optional[ctypes.CDLL]:
    '''Load (building if needed) the native kalman library, or None.'''
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            logging.warning('could not load native kalman library: %s', exc)
            _build_failed = True
            return None

        d = ctypes.POINTER(ctypes.c_double)
        u8 = ctypes.POINTER(ctypes.c_ubyte)
        i = ctypes.c_int
        lib.kalman_filter_native.argtypes = [d, d, d, d, d, d, d, u8,
                                             i, i, i, d, d, d, d]
        lib.kalman_filter_native.restype = i
        lib.kalman_smooth_native.argtypes = [d, d, d, d, d, i, i, d, d, d]
        lib.kalman_smooth_native.restype = i
        _lib = lib
        return _lib
