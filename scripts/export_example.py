"""Run an example headless and export its telemetry to CSV for the
regression gate (parity: reference scripts/ci/regress.sh exporting the
seven baselined examples)."""

import importlib.util
import os
import sys


def load(example: str):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exdir = os.path.join(root, "examples", example)
    sys.path.insert(0, exdir)
    sys.path.insert(0, root)
    os.environ["ELODIN_SKIP_RUN"] = "1"  # top-level w.run() becomes a no-op
    for mod_name in ("sim", "main"):
        path = os.path.join(exdir, f"{mod_name}.py")
        if not os.path.exists(path):
            continue
        spec = importlib.util.spec_from_file_location(
            f"{example}_{mod_name}", path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        if any(
            hasattr(mod, a) for a in ("build_world", "world", "w")
        ):
            return mod
    raise SystemExit(f"no loadable module for example {example}")


def main():
    example, ticks, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    mod = load(example)

    rate = 1.0 / getattr(mod, "SIM_TIME_STEP", 1 / 120)
    if hasattr(mod, "build_world"):
        w = mod.build_world()
        system = mod.build_system()
    elif hasattr(mod, "world"):
        w = mod.world()
        if isinstance(w, tuple):  # (world, entity_id) pattern (ellipsoid)
            w = w[0]
        system = mod.system()
    else:  # module-level world + system (e.g. three-body)
        w = mod.w
        system = getattr(mod, "sys", None)
        import types

        if system is None or isinstance(system, types.ModuleType):
            # a plain `import sys` in the example must not be mistaken
            # for the simulation system
            system = mod.system

    exec_ = w.build(system, simulation_rate=rate)
    exec_.run(ticks)
    exec_.save_archive(out, "csv")
    print(f"exported {example} x{ticks} -> {out}")


if __name__ == "__main__":
    main()
