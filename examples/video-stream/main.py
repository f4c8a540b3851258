"""Video streaming into elodin-db
(parity: examples/video-stream/main.py — the reference pushes GStreamer /
OBS-SRT H.264 into the DB as OpaqueBytes message streams displayed by the
editor; GStreamer and the GPU decode path are editor-side, so this example
keeps the *data plane*: a rolling-ball sim serves telemetry while a frame
producer pushes timestamped opaque video-chunk messages onto a msg stream,
and a consumer tails them live — exactly the path a real encoder would use).

Run headless:
    ELODIN_MAX_TICKS=600 python main.py
then:  python -m elodin_tpu.db repl 127.0.0.1:2240
    >>> client.get_msgs("video.test_pattern")
"""

import os
import threading
import time
import typing as ty
from dataclasses import field

_HERE = os.path.dirname(os.path.abspath(__file__))

import elodin as el  # noqa: E402
import jax  # noqa: E402
from jax import numpy as jnp  # noqa: E402

SIM_TIME_STEP = 1.0 / 120.0
BALL_RADIUS = 0.3
BOUNDARY = 4.0
FRAME_HZ = 30.0
STREAM_NAME = "video.test_pattern"

WindPhase = ty.Annotated[jax.Array, el.Component("wind_phase", el.ComponentType.F64)]


@el.dataclass
class Ball(el.Archetype):
    wind_phase: WindPhase = field(default_factory=lambda: jnp.float64(0.0))


@el.system
def rolling_wind(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[WindPhase, el.WorldPos, el.WorldVel],
) -> el.Query[el.WorldVel]:
    """Rotating wind pushes the ball; walls reflect it (reference wind +
    bounce systems)."""
    t = tick[0] * ts[0]

    def one(phase, pos, vel):
        wind = 2.0 * jnp.array(
            [jnp.cos(0.4 * t + phase), jnp.sin(0.4 * t + phase), 0.0]
        )
        v = vel.linear() + wind * SIM_TIME_STEP
        p = pos.linear()
        hit = (jnp.abs(p[:2]) > BOUNDARY) & (jnp.sign(v[:2]) == jnp.sign(p[:2]))
        v = v.at[:2].set(jnp.where(hit, -v[:2], v[:2]))
        return el.SpatialMotion(angular=vel.angular(), linear=v)

    return q.map(el.WorldVel, one)


def make_frame(seq: int, width: int = 32, height: int = 18) -> bytes:
    """Synthetic "encoded frame": a moving test-pattern payload with a tiny
    header, standing in for an H.264 NAL unit (OpaqueBytes contract)."""
    import numpy as np

    x = (np.arange(width) + seq) % 256
    y = (np.arange(height) * 7 + seq * 3) % 256
    frame = (x[None, :] ^ y[:, None]).astype(np.uint8)
    return b"FRM" + seq.to_bytes(4, "little") + frame.tobytes()


def stream_frames(addr: str, n_frames: int = 60, retries: int = 40) -> int:
    """Producer: push timestamped opaque frames (the gstreamer bridge role,
    stream-video.sh -> impeller2 MsgStream with OpaqueBytes schema)."""
    from elodin_tpu.db import Client

    client = None
    for _ in range(retries):
        try:
            client = Client.connect(addr)
            break
        except OSError:
            time.sleep(0.25)
    if client is None:
        raise SystemExit(f"no db at {addr}")
    t0 = time.time_ns() // 1000
    period_us = int(1_000_000 / FRAME_HZ)
    for i in range(n_frames):
        client.send_msg(STREAM_NAME, make_frame(i), timestamp_us=t0 + i * period_us)
        # pace at FRAME_HZ like a real encoder — a burst would defeat the
        # live-tail path the example demonstrates
        if not os.environ.get("ELODIN_SKIP_RUN"):
            time.sleep(1.0 / FRAME_HZ)
    client.close()
    return n_frames


def tail_frames(addr: str, n_frames: int = 10) -> int:
    """Consumer: tail the live frame stream (the editor's video pane role)
    via a TimestampedMsgStream subscription."""
    from elodin_tpu.db import Client

    client = Client.connect(addr)
    got = 0
    try:
        with client.timestamped_msg_stream(STREAM_NAME) as stream:
            for _ts, data in stream:
                got += 1
                print(f"frame {got}: {len(data)} bytes", flush=True)
                if got >= n_frames:
                    break
    finally:
        client.close()
    return got


def world() -> el.World:
    w = el.World()
    w.spawn(
        [
            el.Body(
                world_pos=el.SpatialTransform(linear=jnp.array([0.0, 0.0, BALL_RADIUS])),
                world_vel=el.SpatialMotion(linear=jnp.array([1.5, 0.7, 0.0])),
                inertia=el.SpatialInertia(mass=0.5),
            ),
            Ball(),
        ],
        name="Ball",
    )
    w.schematic(
        """
        tabs {
            viewport name=Viewport look_at="ball.world_pos" show_grid=#true
            video_stream name="Test Pattern" msg_name="video.test_pattern"
            video_stream name="OBS" msg_name="video.obs" waiting=#true
        }
        """
    )
    return w


def system() -> el.System:
    return rolling_wind | el.six_dof(sys=())


if __name__ == "__main__":
    threading.Thread(
        target=stream_frames, args=("127.0.0.1:2240",), daemon=True
    ).start()

    def _tail():
        time.sleep(1.0)  # wait for serve + producer attach
        try:
            tail_frames("127.0.0.1:2240")
        except Exception:  # headless runs may exit before frames arrive
            pass

    threading.Thread(target=_tail, daemon=True).start()
    world().run(system(), simulation_rate=1.0 / SIM_TIME_STEP)
