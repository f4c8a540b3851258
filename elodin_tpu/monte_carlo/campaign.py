"""Process-per-sample campaign runner (fallback path).

Kept for sims that must talk to external SITL processes over UDP lockstep —
the one case the batched on-device runner cannot absorb.  Mirrors the
reference campaign loop (libs/monte-carlo/src/lib.rs:863,1193): plan ->
worker pool -> per-run context env -> collect result.json -> results.csv +
summary.json, with resume support via the campaign manifest.
"""

from __future__ import annotations

import csv
import json
import os
import socket
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from .sample import materialize_plan

CONTEXT_ENV = "ELODIN_MONTE_CARLO_CONTEXT"


def _free_ports(n: int) -> list[int]:
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def _run_one(sim_path: str, row: dict, out_dir: Path, max_ticks: int | None,
             port_names: list[str], timeout: float | None) -> dict:
    run_id = row["run_id"]
    run_dir = out_dir / "runs" / run_id
    run_dir.mkdir(parents=True, exist_ok=True)
    ports = dict(zip(port_names, _free_ports(len(port_names))))
    ctx = {
        "run_id": run_id,
        "seed": row.get("seed"),
        "run_dir": str(run_dir),
        "db_path": str(run_dir / "db"),
        "params": {
            k.removeprefix("param."): v
            for k, v in row.items()
            if k.startswith("param.")
        },
        "meta": {},
        "slots": {"ports": ports},
    }
    ctx_path = run_dir / "context.json"
    ctx_path.write_text(json.dumps(ctx, indent=2))
    env = dict(os.environ)
    env[CONTEXT_ENV] = str(ctx_path)
    # make sure the child can import the SDK regardless of its cwd
    import elodin_tpu

    sdk_root = str(Path(elodin_tpu.__file__).resolve().parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        [sdk_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    sim_path = str(Path(sim_path).resolve())
    args = [sys.executable, sim_path, "run"]
    if max_ticks is not None:
        env["ELODIN_MAX_TICKS"] = str(max_ticks)
    t0 = time.perf_counter()
    record = {"run_id": run_id, "seed": row.get("seed")}
    record.update({k: v for k, v in row.items() if k.startswith("param.")})
    try:
        proc = subprocess.run(
            args,
            env=env,
            cwd=str(Path(sim_path).parent),
            timeout=timeout,
            capture_output=True,
            text=True,
        )
        record["exit_code"] = proc.returncode
        record["valid"] = proc.returncode == 0
        if proc.returncode != 0:
            (run_dir / "stderr.log").write_text(proc.stderr or "")
    except subprocess.TimeoutExpired:
        record["exit_code"] = -1
        record["valid"] = False
    record["wall_s"] = time.perf_counter() - t0
    result_path = run_dir / "result.json"
    if result_path.exists():
        for k, v in json.loads(result_path.read_text()).items():
            record[f"result.{k}"] = v
    return record


def run_campaign(sim_path: str, config: dict, out_dir: str | Path,
                 workers: int = 1, max_ticks: int | None = None,
                 port_names: list[str] | None = None,
                 timeout: float | None = None,
                 resume: bool = False) -> list[dict]:
    # admission budget (parity: libs/s10/src/admission.rs S10_MAX_INFLIGHT)
    budget = os.environ.get("S10_MAX_INFLIGHT")
    if budget:
        workers = min(workers, max(1, int(budget)))
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest_path = out_dir / "campaign.manifest.json"

    rows = materialize_plan(config, out_dir / "plan.csv")
    done: set[str] = set()
    if resume and manifest_path.exists():
        manifest = json.loads(manifest_path.read_text())
        done = set(manifest.get("completed", []))
        rows = [r for r in rows if r["run_id"] not in done]

    port_names = port_names or []
    records = []
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [
            pool.submit(
                _run_one, sim_path, row, out_dir, max_ticks, port_names, timeout
            )
            for row in rows
        ]
        for f in futures:
            rec = f.result()
            records.append(rec)
            done.add(rec["run_id"])
            manifest_path.write_text(
                json.dumps({"completed": sorted(done)}, indent=2)
            )

    if records:
        results_path = out_dir / "results.csv"
        fieldnames = sorted({k for r in records for k in r})
        with open(results_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(records)

    n_valid = sum(1 for r in records if r.get("valid"))
    summary = {
        "total": len(records),
        "valid": n_valid,
        "invalid": len(records) - n_valid,
        "wall_s": sum(r.get("wall_s", 0.0) for r in records),
    }
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    return records
