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
        # 1.9x serial keeps margin for scheduler jitter/oversleep on loaded
        # machines (perfect overlap ~1.15x; no overlap = 2.0x).
        assert elapsed < 1.9 * n * delay, (
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

    def test_device_put_ahead_with_mesh_sharding(self):
        # The trainer passes the batch sharding so the producer's H2D copy
        # lands each shard on its own device (no device-0 staging +
        # re-shard, ADVICE r4); delivered arrays must already carry it.
        import jax
        from abx_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh()
        sharding = mesh_lib.batch_sharding(mesh)

        def src():
            for i in range(3):
                yield {'x': np.full((8, 4), i, dtype=np.int32)}

        got = list(prefetch(src(), size=2, device_put_ahead=True,
                            device=sharding))
        assert len(got) == 3
        for i, item in enumerate(got):
            assert item['x'].sharding.is_equivalent_to(sharding, 2)
            np.testing.assert_array_equal(np.asarray(item['x']),
                                          np.full((8, 4), i))
        # Re-putting with the same sharding (what Trainer.step does) must
        # be a no-op, not a cross-device transfer.
        again = jax.device_put(got[0]['x'], sharding)
        assert again.sharding.is_equivalent_to(sharding, 2)
