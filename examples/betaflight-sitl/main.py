"""SITL lockstep example (parity target: the reference's betaflight-SITL
integration — native 4-8 kHz UDP lockstep, docs changelog + feature
catalog §19).

A 1-D hover vehicle runs in the sim; an EXTERNAL controller process closes
the altitude loop over the binary UDP lockstep bridge, one exchange per
tick.  Prints the achieved lockstep rate."""

import subprocess
import sys
import time
import typing as ty
from dataclasses import field
from pathlib import Path

import elodin as el
import jax
import jax.numpy as jnp

SIM_RATE = 1000.0
STATE_PORT, CMD_PORT = 9103, 9104

ZPos = ty.Annotated[jax.Array, el.Component("z_pos", el.ComponentType.F64)]
ZVel = ty.Annotated[jax.Array, el.Component("z_vel", el.ComponentType.F64)]
ThrustCmd = ty.Annotated[
    jax.Array,
    el.Component("thrust_cmd", el.ComponentType.F64,
                 metadata={"external_control": "true"}),
]


@el.dataclass
class Hover(el.Archetype):
    z_pos: ZPos = field(default_factory=lambda: jnp.float64(2.0))
    z_vel: ZVel = field(default_factory=lambda: jnp.float64(0.0))
    thrust_cmd: ThrustCmd = field(default_factory=lambda: jnp.float64(0.0))


@el.map
def integrate(z: ZPos, v: ZVel, thrust: ThrustCmd) -> tuple[ZPos, ZVel]:
    dt = 1.0 / SIM_RATE
    a = thrust - 9.81
    v2 = v + a * dt
    return z + v2 * dt, v2


def run(ticks: int = 4000, pipeline: bool = True) -> float:
    w = el.World()
    w.spawn(Hover(), name="craft")
    exec_ = w.build(integrate, simulation_rate=SIM_RATE)

    from elodin_tpu.lockstep import UdpLockstep

    bridge = UdpLockstep(
        exec_,
        send=["craft.z_pos", "craft.z_vel"],
        recv=["craft.thrust_cmd"],
        state_port=STATE_PORT,
        command_port=CMD_PORT,
        timeout=0.05,
    )
    ctrl = subprocess.Popen(
        [sys.executable, str(Path(__file__).with_name("controller.py")),
         str(STATE_PORT), str(CMD_PORT)]
    )
    try:
        time.sleep(0.3)
        if pipeline:
            bridge.run_pipelined(50)  # compile + link sync outside the clock
        t0 = time.perf_counter()
        if pipeline:
            # overlap the controller round-trip with the device step
            # (one-tick actuator transport delay, like the real SITL link)
            bridge.run_pipelined(ticks)
        else:
            for tick in range(ticks):
                bridge.step(tick)
                exec_.run(1)
        wall = time.perf_counter() - t0
        rate = ticks / wall
        z = float(exec_.read_component("craft.z_pos")[0])
        mode = "pipelined" if pipeline else "strict"
        print(f"lockstep rate ({mode}): {rate:,.0f} Hz over {ticks} ticks "
              f"(missed {bridge.missed}); altitude {z:.3f} m")
        assert abs(z - 2.0) < 0.5, "altitude hold failed"
        return rate
    finally:
        ctrl.terminate()
        bridge.close()


def run_batched(trips: int = 40, hold: int = 64) -> float:
    """Device-resident batched lockstep (docs/GUIDE.md): each exchange
    zero-order-holds the thrust command and advances `hold` plant ticks in
    one compiled launch; the controller (here a host PD on the window's
    last telemetry row) runs at SIM_RATE/hold.  This is the mode that puts
    a kHz plant rate on a TPU whose per-tick round-trip costs multiple ms
    — at the named control-rate fidelity tradeoff."""
    import numpy as np

    w = el.World()
    w.spawn(Hover(), name="craft")
    exec_ = w.build(integrate, simulation_rate=SIM_RATE)
    exec_.record_history = False
    session = exec_.lockstep_session(
        ["craft.z_pos", "craft.z_vel"], ["craft.thrust_cmd"], hold_ticks=hold
    )

    def control(z, v):  # PD altitude hold at 2 m
        return float(np.clip(9.81 + 4.0 * (2.0 - z) - 2.0 * v, 0.0, 30.0))

    session.cmd_bufs["thrust_cmd"][0] = control(2.0, 0.0)
    tele = session.tick()  # warm: compile outside the clock
    t0 = time.perf_counter()
    for _ in range(trips):
        session.cmd_bufs["thrust_cmd"][0] = control(
            float(tele[-1, 0]), float(tele[-1, 1])
        )
        tele = session.tick()
    wall = time.perf_counter() - t0
    rate = trips * hold / wall
    z = float(tele[-1, 0])
    print(f"lockstep rate (batched, hold={hold}): {rate:,.0f} Hz plant / "
          f"{SIM_RATE / hold:.1f} Hz control; altitude {z:.3f} m")
    assert abs(z - 2.0) < 0.5, "altitude hold failed"
    return rate


if __name__ == "__main__":
    run()
    run_batched()
