'''Pipeline step base class: initialize/process/finalize lifecycle on a thread.

Parity: m2de/pipeline/pipeline_step.py:12-193. A step consumes dicts from its
input queue, processes them, and forwards results to every output queue; a
``None`` sentinel propagates shutdown downstream.
'''
import logging
import queue
import threading
import time
import traceback
from typing import List, Optional


class PipelineStep(threading.Thread):
    '''One stage of the pipeline, run on its own thread.'''

    def __init__(self, step_name: str, config: dict, progress=None,
                 show_progress: bool = False, **kwargs):
        super().__init__(name=step_name, daemon=True)
        self.step_name = step_name
        self.config = config
        self.input_queue: Optional[queue.Queue] = None
        self.output_queues: List[queue.Queue] = []
        self.shutdown_event: Optional[threading.Event] = None
        self.progress = progress
        self.show_progress = show_progress
        self.is_complete = threading.Event()
        self.error_info: Optional[str] = None
        self.busy_seconds = 0.0
        # host-CPU seconds this stage's thread actually consumed: on a
        # single-core host the wall-clock busy time above is inflated by
        # preemption from sibling stages (and understates nothing), while
        # cpu_seconds attributes real compute; device waits show up in the
        # wall number only
        self.cpu_seconds = 0.0
        self.items_processed = 0

    # -- hooks ---------------------------------------------------------------
    def initialize(self):
        '''Called once on the worker thread before processing.'''

    def process(self, data):
        '''Transform one work item; return the result to forward (or None to
        forward nothing).'''
        raise NotImplementedError

    def finalize(self):
        '''Called once after the input stream is exhausted.'''

    # -- progress helpers ----------------------------------------------------
    def reset_progress(self, total: int):
        '''Reset this step's progress bar total.'''
        if self.progress is not None:
            self.progress.reset(self.step_name, total)

    def update_progress(self, n: int = 1):
        '''Advance this step's progress bar.'''
        if self.progress is not None:
            self.progress.update(self.step_name, n)

    def write_message(self, message: str, level: int = logging.INFO):
        '''Log a message attributed to this step.'''
        logging.log(level, '[%s] %s', self.step_name.strip(), message)

    # -- execution -----------------------------------------------------------
    def _forward(self, data):
        for out_q in self.output_queues:
            while self.shutdown_event is None or not self.shutdown_event.is_set():
                try:
                    out_q.put(data, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def run(self):
        try:
            self.initialize()
            if self.input_queue is None:
                # producer step: generate() drives the stream; time spent
                # between yields (IO + host prep) is the stage's busy time
                gen = self.generate()
                while not self.shutdown_event.is_set():
                    t0 = time.perf_counter()
                    c0 = time.thread_time()
                    try:
                        item = next(gen)
                    except StopIteration:
                        break
                    self.busy_seconds += time.perf_counter() - t0
                    self.cpu_seconds += time.thread_time() - c0
                    self.items_processed += 1
                    self._forward(item)
            else:
                while not self.shutdown_event.is_set():
                    try:
                        data = self.input_queue.get(timeout=0.25)
                    except queue.Empty:
                        continue
                    if data is None:
                        break
                    t0 = time.perf_counter()
                    c0 = time.thread_time()
                    result = self.process(data)
                    self.busy_seconds += time.perf_counter() - t0
                    self.cpu_seconds += time.thread_time() - c0
                    self.items_processed += 1
                    if result is not None:
                        self._forward(result)
            self.finalize()
            if self.items_processed:
                logging.info('[%s] %.2fs busy over %d chunks (%.2fs/chunk)',
                             self.step_name.strip(), self.busy_seconds,
                             self.items_processed,
                             self.busy_seconds / self.items_processed,
                             extra={'nostream': True})
            self._forward(None)  # propagate end-of-stream
        except Exception:  # noqa: BLE001 - worker errors surface via WorkerError
            self.error_info = traceback.format_exc()
            if self.shutdown_event is not None:
                self.shutdown_event.set()
        finally:
            self.is_complete.set()

    def generate(self):
        '''Producer steps override this to yield work items.'''
        return iter(())
