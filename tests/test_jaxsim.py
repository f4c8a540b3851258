"""World.to_jax / JaxSim tests (reference: jaxsim.py, world_builder.rs
to_jax_func) — plus vmap over the whole sim (the pytree registration the
reference exposes at python/elodin/__init__.py:281)."""

import typing as ty
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

import elodin as el

X = ty.Annotated[jax.Array, el.Component("x", el.ComponentType.F64)]


@dataclass
class T(el.Archetype):
    x: X


@el.map
def double(x: X) -> X:
    return x * 2


def _world(x0=1.0):
    w = el.World()
    w.spawn(T(np.float64(x0)), "e1")
    return w


def test_to_jax_step():
    sim = _world().to_jax(double)
    sim.step(3)
    assert float(sim.get_state("x", "e1")) == 8.0
    assert sim.get_tick_count() == 3
    # tick auto-increment handled host-side (jaxsim.py:128-135)
    assert int(sim.get_state("tick", "Globals")) == 3


def test_set_state_applies():
    # the reference's set_state discarded the .at[].set result
    # (jaxsim.py:207); verify the fix
    sim = _world().to_jax(double)
    sim.set_state("x", "e1", jnp.asarray(10.0))
    sim.step(1)
    assert float(sim.get_state("x", "e1")) == 20.0


def test_jaxsim_vmap_over_sims():
    """vmap over the state dict batches whole simulations."""
    sim = _world().to_jax(double)
    xs = jnp.asarray([[1.0], [2.0], [4.0]])

    def run(x_col):
        state = dict(sim.state)
        state["x"] = x_col
        out = sim.py_sim(state)
        return out["x"]

    batched = jax.vmap(run)(xs)
    np.testing.assert_allclose(np.asarray(batched)[:, 0], [2.0, 4.0, 8.0])


def test_six_dof_to_jax_matches_build():
    w1 = el.World()
    w1.spawn(
        el.Body(world_vel=el.SpatialMotion(linear=jnp.array([1.0, 0.0, 0.0]))),
        "b",
    )
    exec_ = w1.build(el.six_dof(1.0 / 60.0), simulation_rate=60.0)
    exec_.run(10)
    pos_build = exec_.history("b.world_pos")["b.world_pos"][-1].to_numpy()

    w2 = el.World()
    w2.spawn(
        el.Body(world_vel=el.SpatialMotion(linear=jnp.array([1.0, 0.0, 0.0]))),
        "b",
    )
    sim = w2.to_jax(el.six_dof(1.0 / 60.0), simulation_rate=60.0)
    sim.step(10)
    pos_jax = np.asarray(sim.get_state("world_pos", "b"))
    np.testing.assert_allclose(pos_jax, pos_build, rtol=1e-12)


def test_c_helper_bundle():
    Y = ty.Annotated[jax.Array, el.Component("cy", el.ComponentType.F64)]
    w = el.World()
    w.spawn(el.C(Y, np.float64(7.0)), "e1")

    @el.map
    def inc(y: Y) -> Y:
        return y + 1

    exec_ = w.build(inc)
    exec_.run(2)
    assert float(exec_.history("e1.cy")["e1.cy"][-1]) == 9.0


def test_shape_indexer():
    P = ty.Annotated[
        jax.Array, el.Component("p", el.ComponentType(el.PrimitiveType.F64, (2, 3)))
    ]
    idx = el.Component.index(P)
    assert idx.indexes() == [0, 1, 2, 3, 4, 5]
    assert idx[1].indexes() == [3, 4, 5]
    assert idx[1][2].indexes() == [5]
    assert el.Component.name(P) == "p"
    assert el.Component.id(P) == "p"


def test_tick_count_survives_jit_roundtrip():
    """Regression: sim_unflatten reset _tick_steps to 0, so tick counts
    vanished across jit/vmap pytree boundaries."""
    import jax

    sim = _world().to_jax(double)
    sim.step(5)
    sim2 = jax.jit(lambda s: s)(sim)
    assert sim2.get_tick_count() == 5

def test_concurrent_component_reads_survive_donated_launches():
    """Both step programs donate their input buffers, so self.cols points at
    deleted jax arrays while a launch is in flight.  Server threads reading
    components (read_component / column_array, the external_control wire
    path) must be serialized against that window — before the _cols_lock fix
    this raced and raised 'Array has been deleted'."""
    import threading

    w = _world()
    exec_ = w.build(double)
    errors: list[BaseException] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                exec_.read_component("e1.x")
                exec_.column_array("x")
            except BaseException as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for _ in range(60):
            exec_.run(10, show_progress=False)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors[0]
    assert exec_.tick() == 600
