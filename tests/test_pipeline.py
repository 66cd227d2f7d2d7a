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
    the bounded queue). Asserted structurally, not by timing: consuming
    item 0 BLOCKS until item 2 has been produced — possible only if
    production is decoupled from consumption (depth=2 queue holds items
    1-2 while 0 is in flight); a serial implementation would deadlock,
    caught by the event timeout."""
    produced_2 = threading.Event()

    def produce():
        for i in range(4):
            if i == 2:
                produced_2.set()
            yield i

    got = []

    def consume(i):
        if i == 0:
            assert produced_2.wait(timeout=30), \
                "producer never ran ahead of the consumer"
        got.append(i)

    consume_stream(produce(), consume, depth=2)
    assert got == [0, 1, 2, 3]


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


def test_prefetch_iter_order_and_overlap():
    """Order is preserved and the producer runs ahead: while the consumer
    holds item 0, it WAITS for item 2's production — only a decoupled
    producer (depth-2 queue) can satisfy that; serial iteration would
    deadlock, caught by the event timeout."""
    from psld_tpu.utils.pipeline import prefetch_iter

    produced_2 = threading.Event()

    def produce():
        for i in range(4):
            if i == 2:
                produced_2.set()
            yield i

    got = []
    for i in prefetch_iter(produce(), depth=2):
        if i == 0:
            assert produced_2.wait(timeout=30), \
                "prefetch thread never ran ahead of the consumer"
        got.append(i)
    assert got == [0, 1, 2, 3]


def test_prefetch_iter_propagates_producer_error():
    from psld_tpu.utils.pipeline import prefetch_iter

    def produce():
        yield 1
        raise RuntimeError("boom")

    it = prefetch_iter(produce(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_iter_abandonment_stops_producer():
    """Dropping the iterator mid-stream (max_steps break) must stop the
    producer thread promptly even though the queue is full."""
    from psld_tpu.utils.pipeline import prefetch_iter

    alive = threading.Event()
    done = threading.Event()

    def produce():
        alive.set()
        for i in range(1000):
            yield i
        done.set()

    it = prefetch_iter(produce(), depth=1)
    assert next(it) == 0
    assert alive.is_set()
    it.close()  # what GC does when the loop rebinds `batches`
    # the producer must NOT have run to completion (it was blocked on the
    # bounded queue and then told to stop)
    assert not done.is_set()
    n = threading.active_count()
    time.sleep(0.3)
    assert threading.active_count() <= n  # no leaked prefetch thread


def test_train_loop_prefetch_is_bit_deterministic(tmp_path):
    """training.prefetch only moves loader work to a thread -- the
    sequential iterator walk preserves RNG/order, so final params are
    BITWISE equal to the unprefetched loop."""
    import jax
    import numpy as np

    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    outs = {}
    for tag, pf in (("off", 0), ("on", 2)):
        cfg = compose([
            "+dataset=cifar10/cifar10_psld",
            "dataset.diffusion.data.name=synthetic",
            f"dataset.diffusion.data.root={tmp_path}",
            "dataset.diffusion.data.image_size=16",
            "dataset.diffusion.data.hflip=True",
            "dataset.diffusion.model.score_fn.nf=8",
            "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
            "dataset.diffusion.model.score_fn.num_res_blocks=1",
            "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
            "dataset.diffusion.training.batch_size=8",
            "dataset.diffusion.training.epochs=1",
            "dataset.diffusion.training.chkpt_interval=100",
            f"dataset.diffusion.training.results_dir={tmp_path}/r_{tag}",
            f"+dataset.diffusion.training.prefetch={pf}",
        ]).dataset.diffusion
        outs[tag] = train_sde(cfg, max_steps=4)
    for a, b in zip(jax.tree_util.tree_leaves(outs["off"].params),
                    jax.tree_util.tree_leaves(outs["on"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
