'''Pipeline queue-invariant stress tests (SURVEY.md §5 race-detection plan).

The runtime is a DAG of threads linked by bounded queues with a None
end-of-stream sentinel and a shared shutdown event. These tests hammer the
invariants that make it safe:

* no loss / no reorder / no duplication through a multi-stage chain under
  randomized producer/consumer delays and tiny (size-2) queues;
* fan-out delivers every item to every consumer;
* a mid-stream step failure sets the shutdown event, unblocks every other
  thread (producers blocked on full queues included), and surfaces exactly
  the failing step in WorkerError;
* sentinel propagation terminates every stage even when consumers are much
  slower than producers.

Reference analog: m2de/pipeline/pipeline.py:12-145 thread/queue runtime.
'''
import random
import threading
import time

import pytest

from moseq2_detectron_extract_tpu.pipeline.pipeline import Pipeline, WorkerError
from moseq2_detectron_extract_tpu.pipeline.pipeline_step import PipelineStep

N_ITEMS = 400


class Producer(PipelineStep):
    def __init__(self, n=N_ITEMS, delay=0.0, jitter=0.0, **kwargs):
        super().__init__(config={}, **kwargs)
        self.n, self.delay, self.jitter = n, delay, jitter

    def generate(self):
        rnd = random.Random(0)
        for i in range(self.n):
            if self.delay or self.jitter:
                time.sleep(self.delay + rnd.random() * self.jitter)
            yield {'seq': i}


class Relay(PipelineStep):
    '''Passes items through, optionally slowly / failing at a given seq.'''

    def __init__(self, delay=0.0, jitter=0.0, fail_at=None, **kwargs):
        super().__init__(config={}, **kwargs)
        self.delay, self.jitter, self.fail_at = delay, jitter, fail_at
        self.rnd = random.Random(1)

    def process(self, data):
        if self.delay or self.jitter:
            time.sleep(self.delay + self.rnd.random() * self.jitter)
        if self.fail_at is not None and data['seq'] == self.fail_at:
            raise RuntimeError(f'injected failure at {self.fail_at}')
        return data


class Collector(PipelineStep):
    def __init__(self, delay=0.0, **kwargs):
        super().__init__(config={}, **kwargs)
        self.seen = []
        self.delay = delay

    def process(self, data):
        if self.delay:
            time.sleep(self.delay)
        self.seen.append(data['seq'])
        return None


def run_pipeline(pipeline, timeout=60.0):
    pipeline.start()
    deadline = time.time() + timeout
    while pipeline.is_running():
        assert time.time() < deadline, 'pipeline hung'
        time.sleep(0.01)
    pipeline.shutdown()


class TestChainIntegrity:
    def test_three_stage_chain_no_loss_no_reorder(self):
        '''400 items through producer -> relay -> relay -> collector with
        randomized delays and size-2 queues: exact sequence preserved.'''
        p = Pipeline(queue_size=2, show_progress=False)
        prod = p.add_step('prod', Producer, jitter=0.002)
        r1 = p.add_step('r1', Relay, jitter=0.001)
        r2 = p.add_step('r2', Relay, jitter=0.003)
        col = p.add_step('col', Collector)
        p.link(prod, r1)
        p.link(r1, r2)
        p.link(r2, col)
        run_pipeline(p)
        assert col.seen == list(range(N_ITEMS))
        assert prod.items_processed == N_ITEMS
        assert r1.items_processed == r2.items_processed == N_ITEMS

    def test_slow_consumer_backpressure(self):
        '''A consumer 100x slower than the producer on a size-2 queue:
        bounded memory by construction, still no loss.'''
        n = 60
        p = Pipeline(queue_size=2, show_progress=False)
        prod = p.add_step('prod', Producer, n=n)
        col = p.add_step('col', Collector, delay=0.005)
        p.link(prod, col)
        run_pipeline(p)
        assert col.seen == list(range(n))


class TestFanOut:
    def test_every_consumer_sees_every_item(self):
        p = Pipeline(queue_size=2, show_progress=False)
        prod = p.add_step('prod', Producer, n=200)
        cols = [p.add_step(f'col{i}', Collector, delay=0.0005 * i)
                for i in range(3)]
        p.link(prod, *cols)
        run_pipeline(p)
        for col in cols:
            assert col.seen == list(range(200))


class TestFailurePropagation:
    def test_midstream_failure_unblocks_and_reports(self):
        '''Relay fails at item 50 while the producer is blocked pushing into
        a full queue: the shutdown event must unblock the producer, every
        thread must exit, and WorkerError must name exactly the failed step.'''
        p = Pipeline(queue_size=2, show_progress=False)
        prod = p.add_step('prod', Producer, n=N_ITEMS)
        relay = p.add_step('relay', Relay, fail_at=50, delay=0.001)
        col = p.add_step('col', Collector)
        p.link(prod, relay)
        p.link(relay, col)
        p.start()
        deadline = time.time() + 30
        while p.is_running():
            assert time.time() < deadline, 'pipeline hung after failure'
            time.sleep(0.01)
        with pytest.raises(WorkerError) as exc_info:
            p.shutdown()
        assert [e.name for e in exc_info.value.error_info] == ['relay']
        assert 'injected failure at 50' in exc_info.value.error_info[0].message
        for step in p.steps:
            step.join(timeout=5.0)
            assert not step.is_alive(), f'{step.step_name} still running'
        # items before the failure flowed through untouched
        assert col.seen == list(range(50))

    def test_failure_in_fanout_branch_stops_all(self):
        p = Pipeline(queue_size=2, show_progress=False)
        prod = p.add_step('prod', Producer, n=N_ITEMS)
        good = p.add_step('good', Collector)
        bad = p.add_step('bad', Relay, fail_at=10)
        p.link(prod, good, bad)
        p.start()
        deadline = time.time() + 30
        while p.is_running():
            assert time.time() < deadline, 'pipeline hung after branch failure'
            time.sleep(0.01)
        with pytest.raises(WorkerError) as exc_info:
            p.shutdown()
        assert [e.name for e in exc_info.value.error_info] == ['bad']
        for step in p.steps:
            assert not step.is_alive()


class TestAccounting:
    def test_busy_seconds_accumulate(self):
        p = Pipeline(queue_size=2, show_progress=False)
        prod = p.add_step('prod', Producer, n=20)
        relay = p.add_step('relay', Relay, delay=0.003)
        col = p.add_step('col', Collector)
        p.link(prod, relay)
        p.link(relay, col)
        run_pipeline(p)
        assert relay.busy_seconds >= 20 * 0.003 * 0.9
        assert relay.items_processed == 20


class RingProducer(PipelineStep):
    '''Forwards blocks from a small buffer ring mid-process (the
    PreviewVideoWriterStep pattern: per-block _forward of a reused slot).'''

    RING = 4  # queue cap 2 + 1 in consumer + 1 being written

    def __init__(self, n_chunks=40, blocks_per_chunk=4, **kwargs):
        super().__init__(config={}, **kwargs)
        self.n_chunks = n_chunks
        self.blocks_per_chunk = blocks_per_chunk
        self.slots = [[None] for _ in range(self.RING)]
        self.block_no = 0

    def generate(self):
        for c in range(self.n_chunks):
            yield {'chunk': c}

    # producer steps use generate(); this one ALSO forwards per block when
    # used as a mid-pipeline step
    def process(self, data):
        for b in range(self.blocks_per_chunk):
            slot = self.slots[self.block_no % self.RING]
            slot[0] = self.block_no  # "render" into the reused buffer
            self._forward({'block_no': self.block_no, 'slot': slot})
            self.block_no += 1
        return None


class SlowRingConsumer(PipelineStep):
    '''Asserts each received slot still holds ITS block (no aliasing) even
    while consuming far slower than the producer renders.'''

    def __init__(self, **kwargs):
        super().__init__(config={}, **kwargs)
        self.checked = []
        self.aliased = []

    def process(self, data):
        time.sleep(0.002)  # slow encoder
        if data['slot'][0] != data['block_no']:
            self.aliased.append((data['block_no'], data['slot'][0]))
        time.sleep(0.002)  # stamp/write while holding the slot
        if data['slot'][0] != data['block_no']:
            self.aliased.append((data['block_no'], data['slot'][0]))
        self.checked.append(data['block_no'])
        return None


class TestPreviewRingInvariant:
    '''The preview render step hands its ring-buffer composites to the
    encode step by reference (pipeline/steps.py): with queue cap 2, a
    4-slot ring must never be overwritten while the encoder holds it.'''

    def test_slots_never_alias_under_slow_consumer(self):
        pipeline = Pipeline(queue_size=2, show_progress=False)
        prod = pipeline.add_step('p', Producer, n=40)
        ring = pipeline.add_step('ring', RingProducer)
        cons = pipeline.add_step('enc', SlowRingConsumer)
        pipeline.link(prod, ring)
        pipeline.link(ring, cons)
        run_pipeline(pipeline)
        assert cons.aliased == []
        assert cons.checked == list(range(40 * 4))

    def test_ring_of_three_would_alias(self):
        # sanity check that the invariant test has teeth: a 3-slot ring
        # (queue cap 2 + 1 in consumer, nothing for the writer) DOES alias
        class SmallRing(RingProducer):
            RING = 2

        pipeline = Pipeline(queue_size=2, show_progress=False)
        prod = pipeline.add_step('p', Producer, n=40)
        ring = pipeline.add_step('ring', SmallRing)
        cons = pipeline.add_step('enc', SlowRingConsumer)
        pipeline.link(prod, ring)
        pipeline.link(ring, cons)
        run_pipeline(pipeline)
        assert cons.aliased != []


class TestPreviewRingDerivation:
    '''The real PreviewVideoWriterStep must DERIVE its ring from its links
    (queue maxsize + consumers), not assume queue_size==2 (ADVICE r4).'''

    @pytest.mark.parametrize('maxsize,consumers,expected', [
        (2, 1, 4),   # the production shape: 2 queued + 1 encoding + 1 rendering
        (5, 1, 7),   # larger queue grows the ring
        (2, 2, 7),   # a sibling consumer grows the ring
    ])
    def test_ring_matches_links(self, maxsize, consumers, expected):
        import queue

        from moseq2_detectron_extract_tpu.pipeline.steps import \
            PreviewVideoWriterStep
        step = PreviewVideoWriterStep.__new__(PreviewVideoWriterStep)
        step.config = {'min_height': 0, 'max_height': 100, 'roi': None}
        step.output_queues = [queue.Queue(maxsize=maxsize)
                              for _ in range(consumers)]
        step.progress = None
        step.step_name = 'preview'
        PreviewVideoWriterStep.initialize(step)
        assert step._ring == expected
