"""Run an example headless and export its telemetry to CSV for the
regression gate."""

import importlib.util
import os
import sys


def main():
    example, ticks, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exdir = os.path.join(root, "examples", example)
    sys.path.insert(0, exdir)
    sys.path.insert(0, root)

    for mod_name in ("sim", "main"):
        path = os.path.join(exdir, f"{mod_name}.py")
        if not os.path.exists(path):
            continue
        spec = importlib.util.spec_from_file_location(f"{example}_{mod_name}", path)
        mod = importlib.util.module_from_spec(spec)
        if mod_name == "main" and not (
            hasattr_safe(path, "build_world") or hasattr_safe(path, "build")
        ):
            continue
        spec.loader.exec_module(mod)
        break
    else:
        raise SystemExit(f"no loadable module for example {example}")

    if hasattr(mod, "build_world"):
        w = mod.build_world()
        system = mod.build_system()
        rate = 1.0 / getattr(mod, "SIM_TIME_STEP", 1 / 120)
    elif hasattr(mod, "world"):
        w = mod.world()
        system = mod.system()
        rate = 1.0 / mod.SIM_TIME_STEP
    else:
        raise SystemExit(f"example {example} has no build entry")

    exec_ = w.build(system, simulation_rate=rate)
    exec_.run(ticks)
    exec_.save_archive(out, "csv")
    print(f"exported {example} x{ticks} -> {out}")


def hasattr_safe(path: str, name: str) -> bool:
    with open(path) as f:
        return f"def {name}" in f.read()


if __name__ == "__main__":
    main()
