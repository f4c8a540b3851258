"""Systems, queries, and the trace-time builder.

TPU-first re-design of the reference's system compiler
(libs/nox-py/src/system.rs, query.rs, graph.rs and
python/elodin/__init__.py:160-557).  The reference traces user functions into
a Rust ``Noxpr`` graph and lowers through StableHLO; here JAX *is* the IR: a
``SystemBuilder`` carries a dict of component columns (jnp arrays, one
``(n_entities, *shape)`` array per component) through the pipeline while JAX
tracers flow through the user functions.  The whole tick is later jitted as a
single XLA program (see ``execimpl``), with ``lax.scan`` over ticks so the
device never round-trips to the host per tick.

Key semantic contracts kept from the reference:

* ``Query.map`` vmaps over the entity axis with a ``batch1`` fast path for
  singleton queries (libs/nox-py/src/query.rs:57,504-545).
* ``Query.map_seq`` uses ``lax.scan`` so ``lax.cond`` keeps short-circuit
  semantics (python/elodin/__init__.py:255-314).
* ``GraphQuery.edge_fold`` folds sequentially over each left entity's edges
  in spawn order, left entities ascending; entities with zero edges are not
  written (libs/nox-py/src/graph.rs:178-235).  The TPU implementation uses a
  dense padded (n_from, max_edges) gather with a masked ``lax.scan`` instead
  of the reference's per-edge-count buckets.
"""

from __future__ import annotations

import inspect
import types as _types
import typing
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .component import Component
from .entity import RevEdge, TotalEdge

tree_flatten = jax.tree_util.tree_flatten
tree_unflatten = jax.tree_util.tree_unflatten


def from_array(cls, arr):
    """Construct a typed component value from a raw array
    (python protocol: cls.from_array, jax.Array passthrough)."""
    if hasattr(cls, "__origin__"):
        cls = cls.__origin__
    if cls is jax.Array or cls is jnp.ndarray or cls is np.ndarray:
        return arr
    from_arr = getattr(cls, "from_array", None)
    if from_arr is None:
        return arr
    return from_arr(arr)


class SystemBuilder:
    """Trace-time state: static world metadata + current column values."""

    def __init__(self, world, cols: dict[str, jax.Array]):
        self.world = world  # WorldMeta snapshot (static python data)
        self.cols = cols  # name -> (n_entities, *shape) traced array

    # -- static metadata helpers -----------------------------------------

    def entities_of(self, name: str) -> tuple[int, ...]:
        try:
            return self.world.comp_entities[name]
        except KeyError:
            raise KeyError(
                f"component {name!r} does not exist in the world "
                "(no entity was spawned with it)"
            ) from None

    def rows_of(self, name: str, entity_ids) -> list[int]:
        index = self.world.comp_index[name]
        return [index[e] for e in entity_ids]

    # -- column access ----------------------------------------------------

    def column(self, name: str) -> jax.Array:
        if name not in self.cols:
            raise KeyError(f"component {name!r} has no column")
        return self.cols[name]

    def write_column(self, name: str, value) -> None:
        col = self.cols[name]
        self.cols[name] = jnp.asarray(value, dtype=col.dtype).reshape(col.shape)

    def gather(self, name: str, entity_ids) -> jax.Array:
        col = self.column(name)
        rows = self.rows_of(name, entity_ids)
        if rows == list(range(col.shape[0])):
            return col
        return col[jnp.asarray(np.array(rows, dtype=np.int32))]

    def scatter(self, name: str, entity_ids, value) -> None:
        col = self.column(name)
        value = jnp.asarray(value, dtype=col.dtype)
        rows = self.rows_of(name, entity_ids)
        if rows == list(range(col.shape[0])):
            self.cols[name] = value.reshape(col.shape)
            return
        self.cols[name] = col.at[jnp.asarray(np.array(rows, dtype=np.int32))].set(
            value.reshape((len(rows),) + col.shape[1:])
        )


# ---------------------------------------------------------------------------
# System composition
# ---------------------------------------------------------------------------


class System:
    """Composable simulation pass: mutates builder columns when called."""

    def call(self, builder: SystemBuilder) -> None:  # pragma: no cover
        raise NotImplementedError

    def pipe(self, other: "System") -> "System":
        return Pipe(self, as_system(other))

    def __or__(self, other) -> "System":
        """``a | b`` pipes systems, matching the reference SDK sugar
        (examples/ball/sim.py:118-120)."""
        return self.pipe(other)

    def __ror__(self, other) -> "System":
        return as_system(other).pipe(self)

    # parity with the pyo3 System.system() used by the reference decorator
    def system(self) -> "System":
        return self


class Pipe(System):
    def __init__(self, *systems: System):
        flat: list[System] = []
        for s in systems:
            if isinstance(s, Pipe):
                flat.extend(s.systems)
            else:
                flat.append(s)
        self.systems = flat

    def call(self, builder: SystemBuilder) -> None:
        for s in self.systems:
            s.call(builder)


class FnSystem(System):
    """A user function whose parameters/return are Query/GraphQuery
    annotations (python/elodin/__init__.py:160-185)."""

    def __init__(self, func: Callable, name: str | None = None):
        self.func = func
        self.name = name or getattr(func, "__name__", repr(func))
        sig = inspect.signature(func)
        self.params = list(sig.parameters.values())
        self.return_annotation = sig.return_annotation
        self.input_ids: list[str] = []
        self.edge_ids: list[str] = []
        for p in self.params:
            ann = p.annotation
            if ann is inspect._empty:
                raise TypeError(
                    f"system {self.name}: parameter {p.name!r} needs a Query "
                    "annotation"
                )
            self.input_ids.extend(ann.component_ids(ann))
            edge_ids = getattr(ann, "edge_ids", None)
            if edge_ids is not None:
                self.edge_ids.extend(ann.edge_ids(ann))
        self.output_ids: list[str] = []
        if self.return_annotation is not inspect._empty:
            self.output_ids.extend(
                self.return_annotation.component_ids(self.return_annotation)
            )

    def call(self, builder: SystemBuilder) -> None:
        args = [
            p.annotation.from_builder(p.annotation, builder, [])
            for p in self.params
        ]
        output = self.func(*args)
        if output is not None:
            output.output(builder, [])

    def __repr__(self):
        return f"<system {self.name}>"


class LambdaSystem(System):
    """Internal system from a builder->None callable (used by six_dof,
    increment_sim_tick, ...)."""

    def __init__(self, fn: Callable[[SystemBuilder], None], name: str = ""):
        self.fn = fn
        self.name = name

    def call(self, builder: SystemBuilder) -> None:
        self.fn(builder)

    def __repr__(self):
        return f"<system {self.name}>"


class RateGroup(System):
    """In-graph multi-rate scheduling: run the wrapped system only on every
    ``every``-th tick, holding its outputs (zero-order hold) in between —
    the real FSW split (guidance/navigation at 10-50 Hz against a 100+ Hz
    plant; the reference runs the same split host-side with Hz drivers,
    fsw/roci).  The gate predicate is the SCALAR simulation tick, so under
    jit the device executes the wrapped ops only on active ticks via
    ``lax.cond``; BatchedCampaign lifts the gate OUTSIDE its sample vmap
    (a cond traced under vmap degrades to select and computes both
    branches — the batched tick is sample-uniform, so lifting is exact).
    Active ticks are 1, 1+every, 1+2*every, ... (the tick increments
    before user systems, and the first tick must produce commands)."""

    def __init__(self, every: int, sys_obj, full_rate_when=None):
        if int(every) < 1:
            raise ValueError(f"every must be >= 1, got {every}")
        self.every = int(every)
        self.system = as_system(sys_obj)
        # cols -> bool array: when ANY entity/sample satisfies it, the
        # schedule escalates to full rate (mission phases where command
        # staleness costs accuracy — e.g. a landing burn's ignition timing
        # — while the cruise phases keep the savings).  The any() makes the
        # predicate sample-uniform, which is what lets BatchedCampaign keep
        # the gate outside the vmap.
        self.full_rate_when = full_rate_when

    def _pred(self, tick, cols):
        import jax.numpy as jnp

        p = (tick - 1) % self.every == 0
        if self.full_rate_when is not None:
            p = p | jnp.any(self.full_rate_when(cols))
        return p

    def call(self, builder: SystemBuilder) -> None:
        if self.every == 1:
            self.system.call(builder)
            return
        import jax

        tick = builder.column("tick")[0]
        cols = dict(builder.cols)

        def run(c):
            b = SystemBuilder(builder.world, dict(c))
            self.system.call(b)
            # cond branches must return identical pytrees: keep the carry's
            # key set (a rate-gated system cannot INTRODUCE columns, they
            # would only exist on active ticks)
            return {k: b.cols[k] for k in c}

        builder.cols = jax.lax.cond(
            self._pred(tick, cols), run, lambda c: dict(c), cols
        )

    def __repr__(self):
        return f"<every {self.every} {self.system!r}>"


def every(every_n: int, sys_obj, full_rate_when=None) -> System:
    """``el.every(5, guidance)``: schedule a system at 1/N of the sim rate
    with zero-order hold; ``full_rate_when=lambda cols: ...`` escalates to
    full rate while any entity/sample satisfies the predicate — see
    RateGroup."""
    return RateGroup(every_n, sys_obj, full_rate_when)


def as_system(obj) -> System:
    if isinstance(obj, System):
        return obj
    if obj is None or obj == ():
        return Pipe()
    if callable(obj):
        return system(obj)
    raise TypeError(f"cannot convert {obj!r} to a System")


def system(func) -> System:
    """``@el.system`` decorator (python/elodin/__init__.py:160-185)."""
    return FnSystem(func)


def build_step(meta, sys_obj):
    """THE one-tick step function ``state -> state``: increment_sim_tick
    piped before the user system — the single composition every executor,
    verifier, rollout, and batched campaign runs.  Kept in one place so the
    tick semantics can't silently diverge between backends."""
    from .six_dof import increment_sim_tick_system  # avoid import cycle

    full = Pipe(increment_sim_tick_system, as_system(sys_obj))

    def step(state):
        b = SystemBuilder(meta, dict(state))
        full.call(b)
        return b.cols

    return step


# ---------------------------------------------------------------------------
# Query
# ---------------------------------------------------------------------------


def _intersect_ordered(lists: list[tuple[int, ...]]) -> list[int]:
    """Entity-id intersection; ids ascend within each column (spawn order),
    so the result is ascending as in the reference's entity-map join
    (libs/nox-py/src/query.rs:179)."""
    if not lists:
        return []
    out = set(lists[0])
    for other in lists[1:]:
        out &= set(other)
    return sorted(out)


class Query:
    """Typed multi-component query over the entity intersection
    (python/elodin/__init__.py:194-357)."""

    def __class_getitem__(cls, item):
        if not isinstance(item, tuple):
            item = (item,)
        return _QueryAlias(cls, item)

    def __init__(self, builder, entity_ids, component_data, component_classes, bufs, batch1):
        self.builder = builder
        self.entity_ids = list(entity_ids)
        self.component_data = component_data
        self.component_classes = component_classes
        self.bufs = bufs
        self.batch1 = batch1

    # -- annotation protocol ---------------------------------------------

    @staticmethod
    def component_ids(new_tp) -> list[str]:
        return [Component.name(t) for t in _args_of(new_tp)]

    @staticmethod
    def from_builder(new_tp, builder: SystemBuilder, args) -> "Query":
        t_args = _args_of(new_tp)
        component_data = [Component.of(t) for t in t_args]
        names = [c.name for c in component_data]
        entity_ids = _intersect_ordered([builder.entities_of(n) for n in names])
        if not entity_ids:
            raise RuntimeError(
                f"query over {names} matched no entities "
                "(the reference backend panics here too)"
            )
        batch1 = len(entity_ids) == 1
        bufs = []
        for n in names:
            g = builder.gather(n, entity_ids)
            bufs.append(g[0] if batch1 else g)
        return Query(builder, entity_ids, component_data, list(t_args), bufs, batch1)

    # -- mapping ----------------------------------------------------------

    def _wrap_outputs(self, out_tps, bufs):
        out_tps = (out_tps,) if not isinstance(out_tps, tuple) else out_tps
        if len(bufs) != len(out_tps):
            # extra returned leaves used to be silently truncated — the
            # discarded component's column kept stale state with no error
            raise RuntimeError(
                f"query returned {len(bufs)} component values for "
                f"{len(out_tps)} declared output types"
            )
        component_data = [Component.of(t) for t in out_tps]
        return Query(
            self.builder,
            self.entity_ids,
            component_data,
            list(out_tps),
            list(bufs[: len(out_tps)]),
            self.batch1,
        )

    def map(self, out_tps, f) -> "Query":
        """vmap ``f`` over the entity axis.  ``lax.cond`` becomes
        ``lax.select`` under vmap; use ``map_seq`` when a branch is expensive
        (python/elodin/__init__.py:212-253)."""
        if self.batch1:
            out = f(*[from_array(c, b) for c, b in zip(self.component_classes, self.bufs)])
        else:
            out = jax.vmap(
                lambda bs: f(
                    *[from_array(c, b) for c, b in zip(self.component_classes, bs)]
                ),
                in_axes=0,
                out_axes=0,
            )(self.bufs)
        bufs, _ = tree_flatten(out)
        return self._wrap_outputs(out_tps, bufs)

    def map_seq(self, out_tps, f) -> "Query":
        """Sequential per-entity map via ``lax.scan``; preserves
        ``lax.cond`` short-circuiting (python/elodin/__init__.py:255-314)."""
        if self.batch1:
            out = f(*[from_array(c, b) for c, b in zip(self.component_classes, self.bufs)])
            bufs, _ = tree_flatten(out)
        else:
            batch = self.bufs[0].shape[0] if self.bufs else 0
            if batch == 0:
                bufs = []
            elif batch == 1:
                out = f(
                    *[
                        from_array(c, b[0])
                        for c, b in zip(self.component_classes, self.bufs)
                    ]
                )
                flat, _ = tree_flatten(out)
                bufs = [jnp.expand_dims(b, 0) for b in flat]
            else:

                def body(carry, xs):
                    args = [
                        from_array(c, x)
                        for c, x in zip(self.component_classes, xs)
                    ]
                    flat, _ = tree_flatten(f(*args))
                    return carry, flat

                _, out_flat = jax.lax.scan(body, None, self.bufs)
                bufs = list(out_flat)
        return self._wrap_outputs(out_tps, bufs)

    def join(self, other: "Query") -> "Query":
        oset = set(other.entity_ids)  # hoisted: O(n+m), not O(n*m)
        ids = [e for e in self.entity_ids if e in oset]
        if not ids:
            raise RuntimeError("joined query matched no entities")

        def regather(q: Query):
            if q.batch1:
                if q.entity_ids != ids:
                    raise RuntimeError("join dropped the only entity")
                return list(q.bufs)
            pos = {e: i for i, e in enumerate(q.entity_ids)}
            rows = np.array([pos[e] for e in ids], dtype=np.int32)
            if len(ids) == 1:
                return [b[rows[0]] for b in q.bufs]
            if list(rows) == list(range(len(q.entity_ids))):
                return list(q.bufs)
            return [b[jnp.asarray(rows)] for b in q.bufs]

        batch1 = len(ids) == 1
        return Query(
            self.builder,
            ids,
            self.component_data + other.component_data,
            self.component_classes + other.component_classes,
            regather(self) + regather(other),
            batch1,
        )

    def output(self, builder: SystemBuilder, args) -> None:
        for data, buf in zip(self.component_data, self.bufs):
            value = buf if not self.batch1 else jnp.asarray(buf)[None]
            builder.scatter(data.name, self.entity_ids, value)

    def __getitem__(self, index: int):
        if len(self.bufs) > 1:
            raise Exception("Cannot index into a query with multiple inputs")
        cls = self.component_classes[0]
        buf = self.bufs[0]
        if self.batch1:
            return from_array(cls, buf)
        return from_array(cls, buf[index])

    def __len__(self):
        return len(self.entity_ids)


class _QueryAlias:
    """Parameterized ``Query[...]`` annotation carrying its component types.

    Works like ``typing.Generic`` aliases but keeps the protocol the
    reference decorator relies on (attribute access forwards to Query)."""

    def __init__(self, cls, args):
        self._cls = cls
        self.__args__ = args

    def __getattr__(self, name):
        return getattr(self._cls, name)

    def __repr__(self):
        return f"{self._cls.__name__}[{', '.join(map(repr, self.__args__))}]"


def _args_of(tp) -> tuple:
    """Type arguments of a Query/GraphQuery alias or typing generic."""
    args = getattr(tp, "__args__", None)
    if args is not None:
        return tuple(args)
    return typing.get_args(tp)


# ---------------------------------------------------------------------------
# GraphQuery / edge_fold
# ---------------------------------------------------------------------------


class GraphQuery:
    """Edge-indexed query (python/elodin/__init__.py:417-557).

    Edges are static world data read at trace time; the fold is executed as
    a dense masked scan over a padded (n_from, max_edges) table — the
    TPU-friendly replacement for the reference's per-edge-count buckets."""

    def __class_getitem__(cls, item):
        if not isinstance(item, tuple):
            item = (item,)
        return _QueryAlias(cls, item)

    def __init__(self, builder: SystemBuilder, edges: list[tuple[int, int]] | None,
                 total: bool = False):
        self.builder = builder
        self.edges = edges  # None for TotalEdge (complete digraph, implicit)
        self.total = total

    @staticmethod
    def component_ids(_new_tp) -> list[str]:
        return []

    @staticmethod
    def edge_ids(new_tp) -> list[str]:
        ids = []
        for t in _args_of(new_tp):
            if t is not TotalEdge:
                ids.append(Component.name(t))
        return ids

    @staticmethod
    def from_builder(new_tp, builder: SystemBuilder, args) -> "GraphQuery":
        t_args = _args_of(new_tp)
        edge_ty = t_args[0]
        if edge_ty is TotalEdge:
            # complete digraph: represented implicitly — materializing n^2
            # Python tuples made trace time O(n^2) at the 8k-body scale the
            # TPU batch axis invites (graph.rs:17 builds the same list, but
            # the reference never sees more than a handful of entities)
            return GraphQuery(builder, None, total=True)
        name = Component.name(edge_ty)
        meta = getattr(edge_ty, "__metadata__", ())
        # scan ALL metadata: RevEdge may sit before or after the Component
        # (Component.of scans too), and positional detection silently lost
        # the reversal — forces folded onto the wrong entities
        reverse = any(m is RevEdge for m in meta)
        edge_vals = builder.world.edge_values(name)
        edges = [(b, a) for (a, b) in edge_vals] if reverse else list(edge_vals)
        return GraphQuery(builder, edges)

    def edge_fold(self, left_query: Query, right_query: Query, return_type,
                  init_value, fold_fn, additive: bool | None = None) -> Query:
        """Fold ``fold_fn(carry, *left, *right)`` over each left entity's
        edges (python/elodin/__init__.py:417-557).

        ``additive`` is the reassociation contract for the TotalEdge fast
        path: ``None`` (default) probes the fold numerically at three
        magnitudes and reassociates into a dense masked sum only when the
        carry enters additively; ``True`` forces the dense path without
        probing (author asserts additivity); ``False`` forces the exact
        sequential scan — use it for folds that are additive only locally
        (e.g. a carry-dependent branch crossing a threshold between probe
        scales), which the probe cannot distinguish.  Explicit-edge queries
        always run the exact per-edge scan.  Global kill switch:
        ELODIN_EDGE_FOLD_DENSE=0."""
        if self.total:
            return self._edge_fold_total(
                left_query, right_query, return_type, init_value, fold_fn,
                additive=additive,
            )
        builder = left_query.builder
        left_set = set(left_query.entity_ids)
        right_set = set(right_query.entity_ids)

        # Group edges by left entity (ascending), edge order preserved
        # (libs/nox-py/src/graph.rs:193-199 uses a BTreeMap keyed by from-id).
        from_map: dict[int, list[int]] = {}
        for f, t in self.edges:
            if f in left_set and t in right_set:
                from_map.setdefault(f, []).append(t)
        from_ids = sorted(from_map)
        if not from_ids:
            raise RuntimeError("edge_fold matched no edges")
        max_e = max(len(v) for v in from_map.values())

        # Dense index tables (static).
        lpos = {e: i for i, e in enumerate(left_query.entity_ids)}
        rpos = {e: i for i, e in enumerate(right_query.entity_ids)}
        n_from = len(from_ids)
        left_rows = np.array([lpos[f] for f in from_ids], dtype=np.int32)
        right_rows = np.zeros((n_from, max_e), dtype=np.int32)
        mask = np.zeros((n_from, max_e), dtype=bool)
        for i, f in enumerate(from_ids):
            tos = from_map[f]
            for j, t in enumerate(tos):
                right_rows[i, j] = rpos[t]
                mask[i, j] = True
            # pad with the last real edge so fold_fn sees finite values
            for j in range(len(tos), max_e):
                right_rows[i, j] = rpos[tos[-1]]

        def batched(q: Query):
            return [jnp.asarray(b)[None] if q.batch1 else b for b in q.bufs]

        lbufs = batched(left_query)
        rbufs = batched(right_query)
        left_vals = [b[jnp.asarray(left_rows)] for b in lbufs]
        right_vals = [b[jnp.asarray(right_rows.reshape(-1))].reshape(
            (n_from, max_e) + b.shape[1:]
        ) for b in rbufs]
        mask_arr = jnp.asarray(mask)

        init_flat, init_tree = tree_flatten(init_value)

        def fold_one(lvals, rvals, m):
            # lvals: per-left-entity component values; rvals: (max_e, ...)
            def body(carry_flat, xs):
                rv, mj = xs
                carry = tree_unflatten(init_tree, carry_flat)
                largs = [
                    from_array(c, v)
                    for c, v in zip(left_query.component_classes, lvals)
                ]
                rargs = [
                    from_array(c, v)
                    for c, v in zip(right_query.component_classes, rv)
                ]
                new = fold_fn(carry, *largs, *rargs)
                new_flat, _ = tree_flatten(new)
                out = [
                    jnp.where(mj, jnp.asarray(n), jnp.asarray(c))
                    for n, c in zip(new_flat, carry_flat)
                ]
                return out, None

            init = [jnp.asarray(x) for x in init_flat]
            if max_e == 1:
                out, _ = body(init, ([rv[0] for rv in rvals], m[0]))
                return out
            out, _ = jax.lax.scan(
                body, init, (rvals, m)
            )
            return out

        folded = jax.vmap(fold_one)(left_vals, right_vals, mask_arr)
        out_flat, _ = tree_flatten(folded)

        component_data = Component.of(return_type)
        batch1 = n_from == 1
        buf = out_flat[0]
        return Query(
            builder,
            from_ids,
            [component_data],
            [return_type],
            [buf[0] if batch1 else buf],
            batch1,
        )

    # -- complete-graph fast path -----------------------------------------

    def _fold_is_additive(self, left_query: Query, right_query: Query,
                          init_value, fold_fn) -> bool:
        """Trace-time numeric probe: does ``fold_fn(c, l, r) == c +
        fold_fn(0, l, r)`` hold?  Physics folds (force/torque accumulation)
        are additive in the carry, which lets the sequential edge fold
        reassociate into a dense masked sum — the only formulation that
        scales past a few dozen bodies on TPU.  Non-additive folds keep the
        exact sequential scan.  Differences are summation-order rounding
        only (the reference itself regroups edges per entity,
        graph.rs:193-199).  Kill switch: ELODIN_EDGE_FOLD_DENSE=0."""
        import os

        if os.environ.get("ELODIN_EDGE_FOLD_DENSE", "1") == "0":
            return False
        init_flat, init_tree = tree_flatten(init_value)
        rng = np.random.default_rng(0x5EED)
        probe_scale = 1.0

        def draw(shape, dtype):
            return jnp.asarray(
                probe_scale * rng.standard_normal(shape), dtype=dtype
            )

        try:
            # rounds probe three magnitudes (1, 1e3, 1e-3): folds that are
            # only LOCALLY additive — e.g. clip(c + f, -LIMIT, LIMIT) with
            # LIMIT above the unit probe scale — must not be misclassified
            for probe_scale in (1.0, 1e3, 1e-3):
                largs = [
                    from_array(c, draw(
                        b.shape[1:] if not left_query.batch1 else b.shape,
                        b.dtype,
                    ))
                    for c, b in zip(left_query.component_classes, left_query.bufs)
                ]
                rargs = [
                    from_array(c, draw(
                        b.shape[1:] if not right_query.batch1 else b.shape,
                        b.dtype,
                    ))
                    for c, b in zip(right_query.component_classes, right_query.bufs)
                ]
                carry_flat = [
                    draw(jnp.asarray(x).shape, jnp.asarray(x).dtype)
                    for x in init_flat
                ]
                zero_flat = [jnp.zeros_like(jnp.asarray(x)) for x in init_flat]
                out_c, _ = tree_flatten(
                    fold_fn(tree_unflatten(init_tree, carry_flat), *largs, *rargs)
                )
                out_z, _ = tree_flatten(
                    fold_fn(tree_unflatten(init_tree, zero_flat), *largs, *rargs)
                )
                for oc, oz, c in zip(out_c, out_z, carry_flat):
                    oc = np.asarray(oc)
                    oz = np.asarray(oz)
                    c = np.asarray(c)
                    if not (np.isfinite(oc).all() and np.isfinite(oz).all()):
                        # NaN/Inf compares False against any tolerance —
                        # without this check a NaN-producing fold would
                        # silently pass as "additive"
                        return False
                    scale = np.maximum(np.abs(oc).max(), 1.0)
                    if np.abs(oc - (c + oz)).max() > 1e-9 * scale:
                        return False
            return True
        except Exception:
            # tracers leaking in from a closure, shape trouble, NaNs — any
            # doubt means take the exact sequential path
            return False

    def _edge_fold_total(self, left_query: Query, right_query: Query,
                         return_type, init_value, fold_fn,
                         additive: bool | None = None) -> Query:
        """TotalEdge edge_fold without the O(n^2) Python edge list.

        Additive folds run as a dense tiled masked sum (lax.scan over
        right-side chunks, everything vectorized inside); non-additive folds
        scan sequentially over the right axis with the same semantics as the
        explicit-edge path."""
        builder = left_query.builder
        lids = list(left_query.entity_ids)
        rids = list(right_query.entity_ids)
        # left entities with zero edges (right set == {self}) are dropped,
        # matching "entities with zero edges are not written"
        if len(rids) == 1 and len(lids) == 1 and lids == rids:
            raise RuntimeError("edge_fold matched no edges")
        from_ids = [f for f in lids if not (len(rids) == 1 and rids[0] == f)]
        if not from_ids:
            raise RuntimeError("edge_fold matched no edges")

        def batched(q: Query):
            return [jnp.asarray(b)[None] if q.batch1 else b for b in q.bufs]

        lbufs = batched(left_query)
        rbufs = batched(right_query)
        if from_ids != lids:
            keep = np.array(
                [i for i, f in enumerate(lids) if f in set(from_ids)],
                dtype=np.int32,
            )
            lbufs = [b[jnp.asarray(keep)] for b in lbufs]
        n_i, n_j = len(from_ids), len(rids)
        lid_arr = jnp.asarray(np.array(from_ids, dtype=np.int32))
        rid_arr = jnp.asarray(np.array(rids, dtype=np.int32))

        init_flat, init_tree = tree_flatten(init_value)
        if additive is None:
            additive = self._fold_is_additive(
                left_query, right_query, init_value, fold_fn
            )
        elif additive:
            import os

            # the global kill switch still wins over a per-call force-dense
            additive = os.environ.get("ELODIN_EDGE_FOLD_DENSE", "1") != "0"

        # Safe substitute right-values for masked (self/padding) pairs: a
        # self-pair fed through fold_fn typically divides by zero distance,
        # and on TPU the NaN survives masking (XLA rewrites select(m, o, 0)
        # into o*m, and NaN*0 is NaN).  Use a REAL other entity's values —
        # right entity 0, or the last one when the left entity IS entity 0 —
        # so fold_fn only ever sees well-posed inputs (the same trick the
        # explicit-edge path uses by padding gathers with real edges).
        is_r0 = np.array([f == rids[0] for f in from_ids])
        alt_leaves = []
        for b in rbufs:
            shape = (-1,) + (1,) * (b.ndim - 1)
            alt_leaves.append(
                jnp.where(jnp.asarray(is_r0).reshape(shape), b[-1], b[0])
            )  # (n_i, *shape)

        if additive:
            zero_flat = [jnp.zeros_like(jnp.asarray(x)) for x in init_flat]

            def contrib(lvals, alt, rvals, m):
                rvals = [jnp.where(m, rv, a) for rv, a in zip(rvals, alt)]
                largs = [
                    from_array(c, v)
                    for c, v in zip(left_query.component_classes, lvals)
                ]
                rargs = [
                    from_array(c, v)
                    for c, v in zip(right_query.component_classes, rvals)
                ]
                out = fold_fn(tree_unflatten(init_tree, zero_flat), *largs, *rargs)
                flat, _ = tree_flatten(out)
                return flat

            # chunk the right axis so intermediates stay O(n_i * K)
            chunk = min(n_j, 1024)
            n_chunks = -(-n_j // chunk)
            pad = n_chunks * chunk - n_j

            def pad_r(b):
                if pad == 0:
                    return b
                return jnp.concatenate(
                    [b, jnp.broadcast_to(b[:1], (pad,) + b.shape[1:])], axis=0
                )

            r_chunked = [
                pad_r(b).reshape((n_chunks, chunk) + b.shape[1:]) for b in rbufs
            ]
            rid_chunked = jnp.concatenate(
                [rid_arr, jnp.full((pad,), -1, dtype=jnp.int32)]
            ).reshape(n_chunks, chunk)

            pair = jax.vmap(  # over i
                jax.vmap(contrib, in_axes=(None, None, 0, 0)),  # over j
                in_axes=(0, 0, None, 0),
            )

            def body(acc, xs):
                r_chunk, rid_chunk = xs
                mask = (lid_arr[:, None] != rid_chunk[None, :]) & (
                    rid_chunk[None, :] >= 0
                )
                outs = pair(lbufs, alt_leaves, r_chunk, mask)
                new = []
                for a, o in zip(acc, outs):
                    m = mask.reshape(mask.shape + (1,) * (o.ndim - 2))
                    new.append(a + jnp.sum(jnp.where(m, o, 0), axis=1))
                return new, None

            acc0 = [
                jnp.broadcast_to(jnp.asarray(x), (n_i,) + jnp.asarray(x).shape)
                for x in init_flat
            ]
            if n_chunks == 1:
                out_flat, _ = body(acc0, (
                    [c[0] for c in r_chunked], rid_chunked[0]
                ))
            else:
                out_flat, _ = jax.lax.scan(
                    body, acc0,
                    ([c for c in r_chunked], rid_chunked),
                )
        else:
            # exact sequential fold over the right axis, vectorized over i
            def fold_one(lvals, alt, lid):
                def body(carry_flat, xs):
                    rv, rid = xs
                    keep = rid != lid
                    rv = [jnp.where(keep, v, a) for v, a in zip(rv, alt)]
                    largs = [
                        from_array(c, v)
                        for c, v in zip(left_query.component_classes, lvals)
                    ]
                    rargs = [
                        from_array(c, v)
                        for c, v in zip(right_query.component_classes, rv)
                    ]
                    new = fold_fn(
                        tree_unflatten(init_tree, carry_flat), *largs, *rargs
                    )
                    new_flat, _ = tree_flatten(new)
                    out = [
                        jnp.where(keep, jnp.asarray(n), jnp.asarray(c))
                        for n, c in zip(new_flat, carry_flat)
                    ]
                    return out, None

                init = [jnp.asarray(x) for x in init_flat]
                out, _ = jax.lax.scan(body, init, (rbufs, rid_arr))
                return out

            out_flat = jax.vmap(fold_one)(lbufs, alt_leaves, lid_arr)

        component_data = Component.of(return_type)
        batch1 = n_i == 1
        buf = out_flat[0]
        return Query(
            builder,
            from_ids,
            [component_data],
            [return_type],
            [buf[0] if batch1 else buf],
            batch1,
        )


# ---------------------------------------------------------------------------
# map decorators (python/elodin/__init__.py:360-396)
# ---------------------------------------------------------------------------


def _map_decorator(func, seq: bool) -> System:
    sig = inspect.signature(func)
    tys = [p.annotation for p in sig.parameters.values()]
    return_ty = sig.return_annotation
    if isinstance(return_ty, _types.GenericAlias):
        return_ty = tuple(return_ty.__args__)

    query_alias = Query[tuple(tys)]

    def inner(q):
        if seq:
            return q.map_seq(return_ty, func)
        return q.map(return_ty, func)

    inner.__name__ = getattr(func, "__name__", "map")
    inner.__signature__ = inspect.Signature(
        parameters=[
            inspect.Parameter(
                "q", inspect.Parameter.POSITIONAL_OR_KEYWORD, annotation=query_alias
            )
        ],
        return_annotation=Query[return_ty if isinstance(return_ty, tuple) else (return_ty,)],
    )
    return FnSystem(inner, name=inner.__name__)


def map(func) -> System:  # noqa: A001  (mirrors el.map)
    return _map_decorator(func, seq=False)


def map_seq(func) -> System:
    return _map_decorator(func, seq=True)
