"""Editor ECS-sync layer tests (parity model: the reference's Bevy sync
cache, libs/impeller2/bevy/src/lib.rs — TelemetryCache coverage/scrub
semantics, live sink, backfill, and edit write-back) run headlessly against
an ephemeral server."""

import time

import numpy as np
import pytest

import elodin_tpu.db as edb
from elodin_tpu.db.mirror import MirrorWorld, SeriesCache, TelemetryCache


@pytest.fixture()
def server(tmp_path):
    srv = edb.Server.start(str(tmp_path / "db"))
    yield srv
    srv.stop()


# -- SeriesCache unit semantics (lib.rs:119-289) --------------------------------


def test_series_insert_ordering_and_scrub():
    s = SeriesCache()
    s.insert(30, np.array([3.0]))
    s.insert(10, np.array([1.0]))   # out of order (backfill racing live)
    s.insert(20, np.array([2.0]))
    s.insert(20, np.array([2.5]))   # duplicate ts keeps latest write
    assert len(s) == 3
    assert s.get_at_or_before(9) is None
    ts, v = s.get_at_or_before(25)
    assert ts == 20 and v[0] == 2.5
    ts, v = s.get_at_or_before(10**9)
    assert ts == 30 and v[0] == 3.0
    ts_arr, vals = s.range(10, 20)
    assert list(ts_arr) == [10, 20]
    assert vals.shape == (2, 1)


def test_coverage_merge_and_gaps():
    s = SeriesCache()
    s.mark_covered(0, 10)
    s.mark_covered(20, 30)
    assert s.is_covered(0, 10)
    assert s.is_covered(5, 8)
    assert not s.is_covered(5, 25)
    assert s.uncovered(0, 30) == [(11, 19)]
    # touching intervals merge (11 touches [0,10])
    s.mark_covered(11, 19)
    assert s.is_covered(0, 30)
    assert s.uncovered(0, 40) == [(31, 40)]
    # fully-before and fully-after queries
    assert s.uncovered(50, 60) == [(50, 60)]
    assert not s.is_covered(50, 60)


def test_cache_generation_bumps():
    c = TelemetryCache()
    g0 = c.generation
    c.insert("a.x", 1, np.array(1.0))
    assert c.generation == g0 + 1
    c.insert("a.x", 2, np.array(2.0))
    assert c.generation == g0 + 2
    assert c.get_at_or_before("a.x", 5)[1] == 2.0
    assert c.get_at_or_before("b.y", 5) is None


# -- live sync against the server -------------------------------------------------


def test_mirror_live_sink_and_entity_tree(server):
    writer_client = edb.Client.connect(server.addr)
    writer = writer_client.table_writer(
        {"ball.world_pos": edb.f64[3], "ball.mass": edb.f64}
    )
    writer.write(timestamp_us=1_000, values={
        "ball.world_pos": [0.0, 0.0, 1.0], "ball.mass": 2.0})
    time.sleep(0.2)

    with MirrorWorld.connect(server.addr) as m:
        writer.write(timestamp_us=2_000, values={
            "ball.world_pos": [0.0, 0.0, 2.0], "ball.mass": 2.0})
        assert m.wait_for("ball.world_pos")
        ts, pos = m.latest("ball.world_pos")
        np.testing.assert_allclose(np.ravel(pos), [0.0, 0.0, 2.0])
        ents = m.entities()
        assert "ball" in ents
        assert set(ents["ball"]) >= {"world_pos", "mass"}
    writer.close()
    writer_client.close()


def test_mirror_backfill_cold_history(server):
    writer_client = edb.Client.connect(server.addr)
    writer = writer_client.table_writer({"craft.alt": edb.f64})
    t0 = 5_000_000
    for i in range(20):
        writer.write(timestamp_us=t0 + i * 1_000, values={"craft.alt": float(i)})
    time.sleep(0.3)

    # connect AFTER the data landed: the live stream never saw it, so a
    # timeline scrub must backfill from the DB's time-series store
    with MirrorWorld.connect(server.addr) as m:
        v = m.value_at("craft.alt", t0 + 10_500, backfill_window_us=50_000)
        assert v is not None and float(np.ravel(v)[0]) == 10.0
        # the fetched range is now covered: scrubbing again is cache-only
        s = m.cache.series("craft.alt")
        assert s.is_covered(t0, t0 + 10_500)
        v2 = m.value_at("craft.alt", t0 + 3_000)
        assert float(np.ravel(v2)[0]) == 3.0
    writer.close()
    writer_client.close()


def test_mirror_edit_writes_back(server):
    with MirrorWorld.connect(server.addr) as m:
        m.set("cfg.gain", [1.5, 2.5], timestamp_us=1_000)
        time.sleep(0.3)
        reader = edb.Client.connect(server.addr)
        ts, vals = reader.time_series("cfg.gain", 0, 10_000)
        assert len(ts) == 1
        np.testing.assert_allclose(vals[0], [1.5, 2.5])
        reader.close()


def test_mirror_on_update_callback(server):
    writer_client = edb.Client.connect(server.addr)
    writer = writer_client.table_writer({"imu.gyro": edb.f64[3]})
    seen = []
    with MirrorWorld.connect(server.addr) as m:
        m.on_update(lambda name, ts, v: seen.append((name, ts)))
        writer.write(timestamp_us=42, values={"imu.gyro": [0.1, 0.2, 0.3]})
        assert m.wait_for("imu.gyro")
    assert any(name == "imu.gyro" for name, _ in seen)
    writer.close()
    writer_client.close()


def test_query_miss_creates_no_phantom_series(server):
    """Probing a nonexistent name (typo) through latest/value_at/wait_for
    must not pollute the mirror's component set with empty series."""
    with MirrorWorld.connect(server.addr) as m:
        assert m.latest("ball.world_poss") is None
        assert m.value_at("ball.world_poss", 10_000_000) is None
        assert not m.wait_for("ball.world_poss", timeout=0.05)
        assert "ball.world_poss" not in m.cache.component_names()


def test_concurrent_insert_and_scrub_stay_consistent():
    """The sink thread and a backfilling caller insert into the SAME
    SeriesCache concurrently (the documented contract): under the per-
    series lock, timestamps stay sorted and paired with their values."""
    import threading

    import numpy as np

    from elodin_tpu.db.mirror import SeriesCache

    s = SeriesCache()
    N = 4000

    def live():  # ascending inserts (the sink)
        for i in range(0, N, 2):
            s.insert(i, np.asarray([float(i)]))

    def backfill():  # out-of-order inserts (history fetch)
        for i in range(N - 1, 0, -2):
            s.insert(i, np.asarray([float(i)]))

    ts = [threading.Thread(target=live), threading.Thread(target=backfill)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(s) == N
    assert s._ts == sorted(s._ts)
    for k in (0, 1, N // 2, N - 1):
        got = s.get_at_or_before(k)
        assert got is not None and got[0] == k and float(got[1][0]) == float(k)


def test_live_contiguous_coverage_stays_compact(server):
    """The real-time stream delivers every ingested row, so the sink grows
    ONE coverage interval per component instead of one per sample — the
    O(n^2) coverage rebuild and the per-gap backfill RPC storm both hinge
    on this."""
    import time

    import numpy as np

    writer = edb.Client.connect(server.addr)
    spec = edb.f64[1].labeled("v")
    with MirrorWorld.connect(server.addr) as m:
        with writer.table_writer({"craft.x": spec}) as w:
            for i in range(50):
                w.write(1_000_000 + i * 10_000, {"craft.x": np.asarray([float(i)])})
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            s = m.cache.peek("craft.x")
            if s is not None and len(s) >= 50:
                break
            time.sleep(0.02)
        s = m.cache.peek("craft.x")
        assert s is not None and len(s) >= 50
        assert len(s._covered) <= 3, s._covered[:5]
