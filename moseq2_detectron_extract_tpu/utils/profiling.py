'''Profiling hooks: cProfile opt-in + jax profiler trace helpers.

Parity: the reference's env-var cProfile hook (m2de/cli.py:65-66 +
io/util.py:239-255, atexit dump). The TPU side adds ``jax.profiler`` traces.
'''
import atexit
import cProfile
import io
import logging
import os
import pstats
import time
from contextlib import contextmanager

_PROFILER = None


def enable_profiling(output_prefix: str = 'profiling_stats') -> None:
    '''Profile the whole process; stats dumped at exit
    (activated by MOSEQ_DETECTRON_PROFILE=1).'''
    global _PROFILER
    if _PROFILER is not None:
        return
    _PROFILER = cProfile.Profile()
    _PROFILER.enable()

    def _dump():
        _PROFILER.disable()
        _PROFILER.dump_stats(output_prefix + '.prof_stats')
        stream = io.StringIO()
        stats = pstats.Stats(_PROFILER, stream=stream)
        stats.sort_stats('cumulative').print_stats(60)
        with open(output_prefix + '.txt', 'w', encoding='utf-8') as fh:
            fh.write(stream.getvalue())
        logging.info('profiling stats written to %s.txt', output_prefix)

    atexit.register(_dump)


@contextmanager
def jax_trace(log_dir: str):
    '''Capture a jax profiler trace (TensorBoard-viewable).'''
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    '''Accumulates wall-time per named stage (the pipeline's per-stage
    counters; eval-loop timing parity with m2de/model/eval.py:125-155).'''

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextmanager
    def time(self, name: str):
        '''Time one occurrence of a stage.'''
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        '''Mean seconds per stage.'''
        return {name: self.totals[name] / max(self.counts[name], 1)
                for name in self.totals}
