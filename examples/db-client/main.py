"""DB client example (parity target: reference examples/db-client):
launch a sim as an s10 recipe, attach with elodin.db.Client, read live
telemetry, run SQL and EQL, write external telemetry back."""

import os
import sys
import time
from pathlib import Path

import elodin.db as edb
from elodin_tpu import s10

ADDR = os.environ.get("ELODIN_SIM_ADDR", "127.0.0.1:2263")


def main():
    ball = Path(__file__).parent.parent / "ball" / "main.py"
    recipe = s10.PyRecipe.sim("ball-sim", str(ball), ADDR)
    recipe.inner.env["ELODIN_KEEP_ALIVE"] = "1"
    running = recipe.spawn()
    try:
        client = _connect_with_retry(ADDR, 60)
        # wait for telemetry
        deadline = time.time() + 60
        while time.time() < deadline:
            comps = client.components()
            if "ball.world_pos" in comps:
                break
            time.sleep(0.25)
        else:
            raise SystemExit(
                "timed out waiting for ball.world_pos telemetry — did the "
                "sim fail to start?"
            )
        print("components:", sorted(comps)[:6], "...")

        sample = client.latest("ball.world_pos")
        print("latest ball.world_pos:", sample.values)

        ts, zs = client.time_series("ball.world_pos", 0, 2**62, limit=50)
        print(f"time series: {len(ts)} rows, z range "
              f"[{zs[:, 6].min():.2f}, {zs[:, 6].max():.2f}]")

        table = client.sql(
            f"SELECT * FROM {edb.sql_table_name('ball.world_pos')} LIMIT 5"
        )
        print("sql rows:", table.num_rows)

        client.send("ground.station_temp", [21.5], timestamp_us=int(time.time() * 1e6))
        time.sleep(0.3)
        print("wrote ground.station_temp:", client.latest("ground.station_temp").values)

        # editor-grade downsample query: LTTB sparkline (a scalar series —
        # sparkline plots element 0, and world_pos element 0 is the
        # constant quaternion-x, a degenerate demo)
        ts_s, vals_s = client.sparkline("ground.station_temp", 32)
        print(f"sparkline: {len(ts_s)} points, last value {vals_s[-1]:.3f}")

        # downsampled element window (plot panel initial load)
        ts_p, vz = client.plot_overview("ball.world_pos", max_points=64,
                                        element_index=6)
        print(f"plot overview: {len(ts_p)} points, z range "
              f"[{vz.min():.2f}, {vz.max():.2f}]")
        client.close()
    finally:
        running.stop()


def _connect_with_retry(addr: str, timeout_s: float) -> edb.Client:
    deadline = time.time() + timeout_s
    while True:
        try:
            return edb.Client.connect(addr)
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.25)


if __name__ == "__main__":
    main()
