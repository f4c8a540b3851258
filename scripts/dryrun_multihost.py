"""Multi-host (DCN) dry run: N processes x M virtual CPU devices each.

Run with no args to launch the default 2-process x 4-device emulation
(what ``tests/test_multihost.py`` gates); run with ``--worker`` plus env
vars to be one process of the job.  On a real TPU pod the same code path
is entered through ``elodin_tpu.parallel.init_multihost()`` with the pod's
coordinator address (or no args at all — jax autodetects on Cloud TPU).

The worker jits one batched 6-dof training step over the GLOBAL mesh
(samples over dp crossing the process boundary = the DCN axis) and checks
the result is identical to the single-process reference.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker() -> None:
    sys.path.insert(0, REPO)
    import jax

    from elodin_tpu.parallel import init_multihost

    init_multihost()
    assert jax.process_count() == int(os.environ["ELODIN_NUM_PROCESSES"])

    import jax.numpy as jnp
    import numpy as np

    from elodin_tpu.models import build_batched_sixdof
    from elodin_tpu.parallel import make_mesh, sharded_step
    from elodin_tpu.six_dof import increment_sim_tick_system
    from elodin_tpu.system import Pipe, SystemBuilder, as_system

    mesh = make_mesh()  # global mesh: dp spans both processes (the DCN axis)
    dp = mesh.shape["dp"]
    n_samples = 2 * dp

    world, system = build_batched_sixdof(4)
    meta, cols = world.snapshot()
    full = Pipe(increment_sim_tick_system, as_system(system))

    def one_tick(state):
        b = SystemBuilder(meta, dict(state))
        full.call(b)
        return b.cols

    vstep = jax.vmap(one_tick)

    def train_step(state):
        return jax.lax.fori_loop(0, 4, lambda _i, s: vstep(s), state)

    batched = {
        k: np.broadcast_to(v, (n_samples,) + v.shape).copy()
        for k, v in cols.items()
    }
    fn, placed = sharded_step(train_step, mesh, batched, sample_axis=True)
    out = fn(placed)
    jax.block_until_ready(out)

    # gather this process's addressable world_pos shards and check them
    # against the single-process reference rollout
    ref = {k: jnp.asarray(v) for k, v in batched.items()}
    ref_out = np.asarray(jax.jit(train_step)(ref)["world_pos"])
    for shard in out["world_pos"].addressable_shards:
        got = np.asarray(shard.data)
        want = ref_out[shard.index]
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
    tick = np.asarray(out["tick"].addressable_shards[0].data)
    assert (tick == 4).all(), tick
    if jax.process_index() == 0:
        print(
            f"dryrun_multihost ok: {jax.process_count()} processes x "
            f"{jax.local_device_count()} devices, dp={dp}, "
            f"{n_samples} samples, 4 ticks",
            flush=True,
        )


def launch(num_processes: int = 2, devices_per_process: int = 4,
           port: int = 19457) -> None:
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_process}"
        )
        env["ELODIN_COORDINATOR"] = f"127.0.0.1:{port}"
        env["ELODIN_NUM_PROCESSES"] = str(num_processes)
        env["ELODIN_PROCESS_ID"] = str(pid)
        # the axon site's jax plugin must not capture backend init in the
        # emulation workers
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                env=env,
            )
        )
    rc = [p.wait(timeout=300) for p in procs]
    if any(rc):
        raise SystemExit(f"multihost dryrun failed: rcs={rc}")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        launch()
