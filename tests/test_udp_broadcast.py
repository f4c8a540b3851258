"""UDP component broadcast bridging two DB instances
(fsw/udp_component_broadcast parity)."""

import socket
import subprocess
import sys
import time

import numpy as np

EX = "examples/udp-component-broadcast"


def _free_udp_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_broadcast_between_two_dbs(tmp_path):
    from elodin_tpu.db import Client, Server

    src = Server.start(str(tmp_path / "src"))
    dst = Server.start(str(tmp_path / "dst"))
    try:
        cs = Client.connect(src.addr)
        pos = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 2.0, 3.0])
        for i in range(5):
            cs.send("bdx.world_pos", pos + 0.1 * i,
                    timestamp_us=1_000_000 + i * 1000)
        time.sleep(0.3)

        port = _free_udp_port()
        recv = subprocess.Popen(
            [sys.executable, "receive.py",
             "--listen", f"127.0.0.1:{port}",
             "--db-addr", dst.addr, "--max-samples", "3",
             # generous: under a saturated parallel suite the broadcaster's
             # own python startup can exceed 10s before the first packet
             "--timeout", "60"],
            cwd=EX, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        # wait for the receiver's readiness line instead of a fixed sleep:
        # under load (parallel test runs on this 1-core box) python startup
        # can exceed any fixed delay and the broadcast would finish before
        # the socket binds
        line = recv.stdout.readline()
        assert "listening" in line, line
        bcast = subprocess.run(
            [sys.executable, "broadcast.py",
             "--db-addr", src.addr,
             "--component", "bdx.world_pos",
             "--rename", "target.world_pos",
             "--rate", "50",
             "--target", f"127.0.0.1:{port}",
             "--source-id", "bdx",
             "--max-samples", "6"],
            cwd=EX, capture_output=True, text=True, timeout=30,
        )
        assert bcast.returncode == 0, bcast.stderr
        assert "broadcast 6 samples" in bcast.stdout
        out, err = recv.communicate(timeout=90)
        assert recv.returncode == 0, err
        assert "received 3 samples (0 lost)" in out

        time.sleep(0.3)
        cd = Client.connect(dst.addr)
        sample = cd.latest("target.world_pos")
        assert sample is not None
        np.testing.assert_allclose(sample.values, pos + 0.4, atol=1e-12)
        assert sample.timestamp_us == 1_004_000  # source timestamp carried
        assert "bdx.world_pos" not in cd.components()  # renamed, not mirrored
        cd.close()
        cs.close()
    finally:
        src.stop()
        dst.stop()
