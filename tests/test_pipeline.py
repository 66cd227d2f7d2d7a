"""utils/pipeline: ordering, overlap, and failure semantics of the
producer/consumer helpers behind the sampling fan-out."""

import threading
import time

import pytest

from psld_tpu.utils.pipeline import consume_stream, lagged


def test_lagged_order_and_completeness():
    assert list(lagged(iter([]))) == []
    assert list(lagged([1])) == [1]
    assert list(lagged([1, 2, 3])) == [1, 2, 3]


def test_lagged_runs_producer_one_ahead():
    events = []

    def produce():
        for i in range(3):
            events.append(("p", i))
            yield i

    for i in lagged(produce()):
        events.append(("c", i))
    # item 1 is produced before item 0 is consumed
    assert events.index(("p", 1)) < events.index(("c", 0))


def test_consume_stream_order_and_threading():
    seen = []
    main = threading.get_ident()

    def consume(i):
        assert threading.get_ident() != main
        seen.append(i)

    consume_stream(range(10), consume, depth=2)
    assert seen == list(range(10))


def test_consume_stream_overlaps():
    """Producer must run ahead of the consumer (that's the whole point of
    the bounded queue). Asserted by event ordering, not wall-clock — a
    loaded CI host must not flake this."""
    events = []
    lock = threading.Lock()

    def mark(tag, i):
        with lock:
            events.append((tag, i))

    def produce():
        for i in range(4):
            time.sleep(0.002)  # fast "device"
            mark("p", i)
            yield i

    def consume(i):
        mark("c_start", i)
        time.sleep(0.05)  # slow "host"
        mark("c_end", i)

    consume_stream(produce(), consume, depth=2)
    # overlap: with a fast producer and depth-2 queue, items 1 and 2 are
    # produced while item 0 is still being consumed (25x timing margin)
    assert events.index(("p", 2)) < events.index(("c_end", 0)), events


def test_consume_stream_propagates_consumer_error_no_deadlock():
    def consume(i):
        if i == 1:
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        # many items after the failure: producer must not deadlock on the
        # bounded queue once the worker died
        consume_stream(range(100), consume, depth=2)


def test_consume_stream_propagates_producer_error():
    def produce():
        yield 1
        raise ValueError("producer died")

    with pytest.raises(ValueError, match="producer died"):
        consume_stream(produce(), lambda i: None)
