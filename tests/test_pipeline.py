"""Input-pipeline prefetch tests (abx_tpu/data/pipeline.py)."""

import time

import numpy as np
import pytest

from abx_tpu.data.pipeline import PrefetchIterator, prefetch


def _slow_source(n, delay, fail_at=None):
    for i in range(n):
        if fail_at is not None and i == fail_at:
            raise RuntimeError(f'producer failed at {i}')
        time.sleep(delay)
        yield {'x': np.full((4,), i, dtype=np.int32)}


class TestPrefetch:
    def test_order_and_contents_preserved(self):
        got = list(prefetch(_slow_source(7, 0.0), size=3))
        assert len(got) == 7
        for i, item in enumerate(got):
            np.testing.assert_array_equal(item['x'], np.full((4,), i))

    def test_overlaps_producer_with_consumer(self):
        # Producer needs 10 x 20 ms = 200 ms; consumer also works 20 ms per
        # item.  Serial would be ~400 ms; with prefetch the producer hides
        # behind the consumer (~230 ms).  Assert well under serial time.
        n, delay = 10, 0.02
        it = prefetch(_slow_source(n, delay), size=2)
        t0 = time.perf_counter()
        count = 0
        for _ in it:
            time.sleep(delay)  # simulated device step
            count += 1
        elapsed = time.perf_counter() - t0
        assert count == n
        assert elapsed < 1.7 * n * delay, (
            f'no overlap: {elapsed:.3f}s vs serial {2 * n * delay:.3f}s')

    def test_producer_exception_reraised_at_next(self):
        it = prefetch(_slow_source(10, 0.0, fail_at=3), size=2)
        got = []
        with pytest.raises(RuntimeError, match='producer failed at 3'):
            for item in it:
                got.append(int(item['x'][0]))
        assert got == [0, 1, 2]

    def test_close_unblocks_full_queue(self):
        it = PrefetchIterator(_slow_source(100, 0.0), size=1)
        next(it)
        it.close()  # producer is blocked on a full queue; must not hang
        assert not it._thread.is_alive()
        with pytest.raises(StopIteration):
            next(it)

    def test_size_zero_passthrough(self):
        src = _slow_source(3, 0.0)
        assert prefetch(src, size=0) is src

    def test_device_put_ahead(self):
        import jax
        got = list(prefetch(_slow_source(3, 0.0), size=2,
                            device_put_ahead=True))
        assert all(isinstance(item['x'], jax.Array) for item in got)
        np.testing.assert_array_equal(np.asarray(got[2]['x']),
                                      np.full((4,), 2))
