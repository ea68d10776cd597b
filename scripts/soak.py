#!/usr/bin/env python
"""Soak runner: the env-gated benchmark/stability suite on a CI-style cadence.

Wraps tests/test_benchmarks.py (the analogue of the reference's
ProductionReadinessStabilityTests soak profiles) so operators get one command:

    python scripts/soak.py --scale standard --repeat 3 --out soak.json

Each repeat runs the full env-gated suite (ingest throughput, warm-search and
recall-build latency percentiles, cold open, soak latency-drift gates) and appends
its metric dump; the runner exits non-zero if any repeat fails, and prints a compact
drift table across repeats so slow degradation shows up over a long cadence.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_once(scale: str, idx: int, tmp: Path) -> dict:
    out = tmp / f"soak_{idx}.json"
    env = dict(
        os.environ,
        WAX_TPU_BENCHMARK="1",
        WAX_TPU_BENCHMARK_SCALE=scale,
        WAX_TPU_BENCHMARK_OUTPUT=str(out),
        JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"),
    )
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_benchmarks.py", "-q", "--no-header"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    rows = json.loads(out.read_text()) if out.exists() else []
    metrics = {r["metric"]: r for r in rows}
    return {
        "repeat": idx,
        "ok": proc.returncode == 0,
        "tail": proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "",
        "metrics": metrics,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", default="smoke", choices=["smoke", "standard", "stress"])
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--out", default=None, help="write the aggregated JSON report here")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="wax-soak-"))
    runs = []
    for i in range(args.repeat):
        r = run_once(args.scale, i, tmp)
        runs.append(r)
        print(f"repeat {i}: {'PASS' if r['ok'] else 'FAIL'} — {r['tail']}", flush=True)

    # drift table: each metric's trajectory across repeats
    keys = sorted({k for r in runs for k in r["metrics"]})
    for k in keys:
        vals = [r["metrics"].get(k, {}).get("value") for r in runs]
        shown = ["-" if v is None else f"{v:.3g}" for v in vals]
        print(f"  {k}: {' -> '.join(shown)}")

    report = {"scale": args.scale, "runs": runs, "all_ok": all(r["ok"] for r in runs)}
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
    return 0 if report["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
