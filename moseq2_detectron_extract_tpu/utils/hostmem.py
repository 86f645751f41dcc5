'''Host allocator tuning for the streaming extraction workload.

glibc malloc serves allocations above M_MMAP_THRESHOLD (128 KB default) with
fresh ``mmap`` regions and returns them to the kernel on free. The extraction
pipeline allocates and frees ~165 MB chunk buffers (plus multi-MB pull
buffers) every chunk, so with the default policy every chunk pays a fresh
demand-paging pass — measured at ~300 us/page on a memory-pressured
Firecracker host, i.e. ~12 s of kernel time per 3000 frames charged to the
producer thread alone.

Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps those blocks in the
heap across free/alloc cycles: after the first lap the pages are warm and
reused. Costs only RSS high-watermark (bounded by the pipeline's steady
working set).
'''
import ctypes
import ctypes.util
import logging

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_host_allocator(threshold_bytes: int = 1 << 30) -> bool:
    '''Keep large freed blocks heap-resident for warm reuse. Idempotent;
    returns True when mallopt was applied.'''
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL(ctypes.util.find_library('c') or 'libc.so.6',
                           use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes)
        _done = bool(ok1 and ok2)
        if not _done:
            logging.debug('mallopt rejected the allocator thresholds')
        return _done
    except (OSError, AttributeError):  # non-glibc platform
        logging.debug('host allocator tuning unavailable', exc_info=True)
        return False
