"""Systematic concurrency checking (loom analog, SURVEY §5 race
detection): the deterministic interleaving explorer itself, then the
repo's shared-state protocols under adversarial schedules — the shm SPSC
ring across two attached instances (the cross-process bbqueue model) and
lock-based Database storage."""

import numpy as np
import pytest

from elodin_tpu.testing import Interleaver, explore
from elodin_tpu.testing.interleave import InterleaveError


def test_checker_catches_a_lost_update():
    """Sanity: a two-line read-modify-write race across two threads MUST
    lose an update under some schedule — if the checker can't find a
    planted race, its exploration is broken."""
    lost = False
    for seed in range(40):
        state = {"x": 0}

        def inc():
            for _ in range(3):
                t = state["x"]
                state["x"] = t + 1

        Interleaver(inc, inc, seed=seed).run()
        assert 3 <= state["x"] <= 6
        if state["x"] != 6:
            lost = True
            break
    assert lost, "planted race never hit in 40 schedules"


def test_same_seed_replays_same_schedule():
    def make_fns(state):
        def a():
            for _ in range(4):
                t = state["x"]
                state["x"] = t + 1

        def b():
            for _ in range(4):
                t = state["x"]
                state["x"] = t * 2

        return a, b

    results = []
    schedules = []
    for _ in range(2):
        state = {"x": 1}
        iv = Interleaver(*make_fns(state), seed=1234).run()
        results.append(state["x"])
        schedules.append(iv.schedule)
    assert results[0] == results[1]
    assert schedules[0] == schedules[1]


def test_worker_exception_propagates():
    def boom():
        raise ValueError("planted")

    with pytest.raises(ValueError, match="planted"):
        Interleaver(boom, seed=0).run()


def test_step_budget_catches_livelock():
    def spin():
        while True:
            pass

    with pytest.raises(InterleaveError, match="budget"):
        Interleaver(spin, seed=0, max_steps=500).run()


def test_blocking_primitive_falls_back():
    """A real lock held across yield points must not deadlock the
    scheduler: the holder is eventually re-granted and releases."""
    import threading

    lock = threading.Lock()
    order = []

    def a():
        with lock:
            order.append("a-in")
            x = 1 + 1  # a yield point while holding the lock
            order.append(("a-out", x))

    def b():
        with lock:
            order.append("b-in")

    Interleaver(a, b, seed=3, block_timeout=0.02).run()
    assert len(order) == 3


def _ring_frames():
    # sizes chosen to force wraps and skip markers in a 512-byte ring
    return [bytes([i % 251]) * ((i * 37) % 180 + 1) for i in range(24)]


def test_shm_ring_spsc_under_adversarial_schedules(tmp_path):
    """The bbqueue-model SPSC ring (db/framing.py): producer and consumer
    on two attached instances of the same file — the cross-process
    layout — must deliver every frame exactly once, in order, untorn,
    under every explored preemption pattern (including preemption between
    the header write, the payload write, and the write_pos publish)."""
    from elodin_tpu.db.framing import ShmRing

    frames = _ring_frames()
    n_case = [0]

    def make():
        path = str(tmp_path / f"ring{n_case[0]}.shm")
        n_case[0] += 1
        prod = ShmRing(path, capacity=512)
        cons = ShmRing(path, create=False)
        got: list[bytes] = []

        def producer():
            i = 0
            spins = 0
            while i < len(frames):
                if prod.push(frames[i]):
                    i += 1
                else:
                    spins += 1
                    assert spins < 100_000

        def consumer():
            spins = 0
            while len(got) < len(frames):
                f = cons.pop()
                if f is not None:
                    got.append(f)
                else:
                    spins += 1
                    assert spins < 100_000

        def check():
            assert got == frames, (
                f"delivered {len(got)}/{len(frames)}; first divergence at "
                f"{next((k for k, (a, b) in enumerate(zip(got, frames)) if a != b), None)}"
            )
            prod.close()
            cons.close()

        return [producer, consumer], check

    explored = explore(make, seeds=range(25), yield_every=2)
    assert explored == 25


def test_checker_catches_early_publish_ring_bug(tmp_path):
    """Teeth check: a ring that publishes write_pos BEFORE copying the
    payload (the classic SPSC ordering bug) must be caught — the consumer
    observes a torn/stale frame under some schedule.  This is precisely
    the class of bug the reference's loom tests exist for."""
    import struct

    from elodin_tpu.db.framing import _RING_HEADER, ShmRing

    class EarlyPublishRing(ShmRing):
        def push(self, frame: bytes) -> bool:
            need = 4 + len(frame)
            if need + 4 > self._free():
                return False
            w = self.write_pos
            if w + need > self.capacity:
                if self.capacity - w >= 4:
                    struct.pack_into("<I", self.map, _RING_HEADER + w,
                                     self.SKIP)
                w = 0
                if need + 4 > (self.read_pos - 1) % self.capacity:
                    return False
            struct.pack_into("<I", self.map, _RING_HEADER + w, len(frame))
            self._store(0, (w + need) % self.capacity)  # BUG: early publish
            self.map[_RING_HEADER + w + 4:
                     _RING_HEADER + w + 4 + len(frame)] = frame
            return True

    frames = _ring_frames()
    n_case = [0]

    def make():
        path = str(tmp_path / f"bad{n_case[0]}.shm")
        n_case[0] += 1
        prod = EarlyPublishRing(path, capacity=512)
        cons = ShmRing(path, create=False)
        got: list[bytes] = []

        def producer():
            i = 0
            while i < len(frames):
                if prod.push(frames[i]):
                    i += 1

        def consumer():
            spins = 0
            while len(got) < len(frames) and spins < 100_000:
                f = cons.pop()
                if f is not None:
                    got.append(f)
                else:
                    spins += 1

        def check():
            assert got == frames

        return [producer, consumer], check

    with pytest.raises(AssertionError, match="seed="):
        explore(make, seeds=range(25), yield_every=2)


def test_storage_concurrent_append_and_read(tmp_path):
    """Lock-based Database storage: a writer appending rows races a
    reader calling range(); the reader must always observe a clean prefix
    (monotonic timestamps, untorn rows where every element equals the row
    index)."""
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    n_case = [0]

    def make():
        db = Database(str(tmp_path / f"db{n_case[0]}"))
        n_case[0] += 1
        store = db.get_or_create(
            component_id_of("t.x"), "f64", (3,), "t.x"
        )
        seen: list = []

        def writer():
            for i in range(6):
                store.append(1_000_000 + i, np.full(3, float(i)))

        def reader():
            for _ in range(6):
                ts, vals = store.range(0, 2**62)
                seen.append((np.asarray(ts).copy(),
                             np.asarray(vals).copy()))

        def check():
            for ts, vals in seen:
                assert list(ts) == sorted(ts)
                for k, row in enumerate(np.asarray(vals)):
                    assert (row == row[0]).all(), "torn row"
                    assert row[0] == float(ts[k] - 1_000_000)

        return [writer, reader], check

    explored = explore(make, seeds=range(8), block_timeout=0.02)
    assert explored == 8


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
