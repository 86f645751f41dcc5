'''Per-step progress tracking with tqdm bars (m2de/pipeline/progress.py parity,
simplified for the thread-based runtime: no cross-process message queues).'''
import threading
import time
from typing import Dict, Optional

from tqdm.auto import tqdm


class ProcessProgress:
    '''Holds one tqdm bar + counters per pipeline step.'''

    def __init__(self, enable: bool = True):
        self.enable = enable
        self._bars: Dict[str, tqdm] = {}
        self._stats: Dict[str, dict] = {}
        self._lock = threading.Lock()

    def add(self, name: str, total: Optional[int] = None, show: bool = True):
        '''Register a step.'''
        with self._lock:
            self._stats[name] = {'total': total, 'completed': 0,
                                 'start': time.time()}
            if self.enable and show:
                self._bars[name] = tqdm(total=total, desc=name, position=len(self._bars),
                                        leave=False)

    def reset(self, name: str, total: int):
        '''Reset a step's total.'''
        with self._lock:
            if name in self._stats:
                self._stats[name]['total'] = total
            bar = self._bars.get(name)
            if bar is not None:
                bar.reset(total=total)

    def update(self, name: str, n: int = 1):
        '''Advance a step's completion count.'''
        with self._lock:
            if name in self._stats:
                self._stats[name]['completed'] += n
            bar = self._bars.get(name)
            if bar is not None:
                bar.update(n)

    def get_stats(self, name: str) -> Optional[dict]:
        '''Stats dict: total / completed / elapsed.'''
        with self._lock:
            stats = self._stats.get(name)
            if stats is None:
                return None
            return {'total': stats['total'], 'completed': stats['completed'],
                    'elapsed': time.time() - stats['start']}

    def close(self):
        '''Close all bars.'''
        with self._lock:
            for bar in self._bars.values():
                bar.close()
            self._bars.clear()
