"""batch_schedule: greedy pow2 decomposition invariants."""

import pytest

from alphadia_tpu.utils.device import batch_schedule, effective_batch


@pytest.mark.parametrize("n", [1, 255, 256, 257, 1000, 4096, 12000, 26400, 100001])
@pytest.mark.parametrize("cap", [1024, 4096, 16384])
def test_schedule_covers_exactly(n, cap):
    sched = batch_schedule(n, cap)
    covered = 0
    for b0, bsz in sched:
        assert b0 == covered  # contiguous
        assert bsz >= 256 and (bsz & (bsz - 1)) == 0  # pow2 >= floor
        assert bsz <= cap
        covered += min(bsz, n - b0)
    assert covered == n
    # total padded rows bounded: < floor + largest-batch/4
    slots = sum(bsz for _, bsz in sched)
    assert slots - n < max(256, sched[0][1] // 4) + 256


def test_schedule_prefers_large_batches():
    sched = batch_schedule(26400, 16384)
    assert sched[0][1] == 16384
    assert len(sched) <= 4  # vs 7 fixed-size batches
    sizes = [b for _, b in sched]
    assert sizes == sorted(sizes, reverse=True)


def test_schedule_small_run_single_batch():
    sched = batch_schedule(100, 16384)
    assert sched == [(0, 256)]
    assert effective_batch(16384, 100) == 256


def test_schedule_empty():
    assert batch_schedule(0, 4096) == []
