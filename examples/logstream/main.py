"""Log streaming: structured FSW text logs into elodin-db alongside sim
telemetry (parity: examples/logstream/main.py — the reference builds a C++
log client, libs/db/examples/log-client.cpp, and launches it via s10; here
the producer is a subprocess of this same script started through an s10
ProcessRecipe, sending LogEntry-style messages while a bouncing-ball sim
serves telemetry).

Run headless:
    ELODIN_MAX_TICKS=600 python main.py
then inspect:
    python -m elodin_tpu.db repl 127.0.0.1:2240
    >>> client.get_msgs("fsw_log")
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "ball"))

import elodin as el  # noqa: E402

LOG_TOPIC = "fsw_log"
DB_ADDR = "127.0.0.1:2240"  # default serve address of `python main.py`


def log_producer(addr: str, n: int = 40, retries: int = 40) -> int:
    """Producer half (the log-client role): boot banner, telemetry chatter,
    a warning and an error, as structured log messages
    ({level, message}; levels per impeller2/wkt LogEntry: 0 trace .. 4 error)."""
    from elodin_tpu.db import Client

    client = None
    for _ in range(retries):
        try:
            client = Client.connect(addr)
            break
        except OSError:
            time.sleep(0.25)
    if client is None:
        raise SystemExit(f"could not reach db at {addr}")
    t0_us = time.time_ns() // 1000

    def emit(i, level, message):
        client.send_msg(
            LOG_TOPIC, {"level": level, "message": message},
            timestamp_us=t0_us + i * 1000,
        )

    emit(0, 2, "boot: flight software v1.2.0")
    emit(1, 2, "boot: IMU online")
    emit(2, 2, "boot: entering main loop")
    for i in range(3, n - 2):
        emit(i, 1 if i % 4 else 2, f"tick {i}: attitude nominal")
    emit(n - 2, 3, "battery: cell 2 below 3.5 V")
    emit(n - 1, 4, "nav: GPS fix lost")
    client.close()
    return n


if __name__ == "__main__":
    if "--producer" in sys.argv:
        addr = sys.argv[sys.argv.index("--producer") + 1]
        log_producer(addr)
        sys.exit(0)

    from sim import SIM_TIME_STEP, system, world  # ball example

    recipe = el.s10.PyRecipe.process(
        "log-client",
        sys.executable,
        [os.path.join(_HERE, "main.py"), "--producer", DB_ADDR],
        env={**os.environ},
    )
    sup = el.s10.Supervisor()
    sup.start([recipe])
    try:
        w = world(seed=1)
        w.run(system(), simulation_rate=1.0 / SIM_TIME_STEP)
    finally:
        sup.stop_all()
