'''Persistent XLA compilation cache.

The production inference program takes minutes to compile over a tunneled
device; the cache makes every run after the first start in seconds. Enabled
by the CLI, bench.py, and the graft harness. Opt out with
MOSEQ_NO_COMPILE_CACHE=1; override the location with MOSEQ_COMPILE_CACHE_DIR.
'''
import logging
import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')


def enable_compilation_cache(cache_dir: str = None) -> str:
    '''Point jax at a persistent on-disk compilation cache; returns the dir
    (or None when disabled). Safe to call repeatedly and before/after other
    jax config; must run before the first jit compilation to matter.'''
    if os.environ.get('MOSEQ_NO_COMPILE_CACHE'):
        return None
    cache_dir = (cache_dir or os.environ.get('MOSEQ_COMPILE_CACHE_DIR')
                 or _DEFAULT_DIR)
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache everything: even sub-second entries add up across the ~30
        # programs the pipeline compiles
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception as exc:  # noqa: BLE001 - cache is best-effort
        logging.warning('could not enable jax compilation cache: %s', exc)
        return None
    return cache_dir
