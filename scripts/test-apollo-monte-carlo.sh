#!/usr/bin/env bash
# Truncated deterministic apollo-lander campaign gate
# (parity: reference scripts/test-apollo-monte-carlo.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
: "${JAX_PLATFORMS:=cpu}"
export JAX_PLATFORMS

python - <<'PY'
import json, sys
import os
os.environ["ELODIN_SKIP_RUN"] = "1"
sys.path.insert(0, "examples/apollo-lander")
import importlib.util as ilu
spec = ilu.spec_from_file_location("apollo_m", "examples/apollo-lander/main.py")
mod = ilu.module_from_spec(spec); spec.loader.exec_module(mod)
out = mod.run_dispersed(16, seed=7)
print(json.dumps({k: float(v) for k, v in out.items()}, indent=2))
assert out["landed_frac"] > 0.9
PY
echo "apollo MC gate: OK"
