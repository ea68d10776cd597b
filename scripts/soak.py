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


def _rss_kb(pid: int) -> int:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError(f"no VmRSS for pid {pid}")


def mcp_soak(rounds: int, ops_per_round: int, rss_slope_gate_kb: float, out: str | None) -> int:
    """Long-running MCP-server soak with an RSS drift gate.

    The reference gates production readiness on RSS *and* latency drift over a
    long-lived process (ProductionReadinessStabilityTests.swift:34-210). Here: ONE
    wax-tpu MCP server subprocess serves `rounds` rounds of remember/search/recall/
    forget/flush traffic over stdio JSON-RPC; VmRSS is sampled after every round.
    Gate: the per-round RSS slope over the steady-state tail (round 2 onward, least
    squares) must stay under `rss_slope_gate_kb` KiB/round. Exits non-zero on a
    breach or on any protocol error.
    """
    import json as _json
    import time

    tmp = Path(tempfile.mkdtemp(prefix="wax-mcp-soak-"))
    env = dict(
        os.environ,
        WAX_TPU_STORE=str(tmp / "soak.wxs"),
        WAX_TPU_EMBEDDER="hash",
        JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"),
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "wax_tpu.surfaces.mcp_server"],
        cwd=REPO,
        env=env,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    mid = 0

    def call(tool: str, args: dict) -> dict:
        nonlocal mid
        mid += 1
        req = {"jsonrpc": "2.0", "id": mid, "method": "tools/call",
               "params": {"name": tool, "arguments": args}}
        proc.stdin.write(_json.dumps(req) + "\n")
        proc.stdin.flush()
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError("mcp server closed stdout")
        resp = _json.loads(line)
        if "error" in resp:
            raise RuntimeError(f"{tool}: {resp['error']}")
        return resp

    rss: list[int] = []
    lat: list[float] = []
    remembered: list[int] = []
    try:
        call("wax_session_start", {"name": "soak"})
        for r in range(rounds):
            t0 = time.perf_counter()
            for i in range(ops_per_round):
                k = (r * ops_per_round + i) % 7
                if k <= 2:
                    resp = call("wax_remember", {"content": f"soak round {r} item {i} topic-{i % 9}"})
                    payload = _json.loads(resp["result"]["content"][0]["text"])
                    remembered.append(payload["document_id"])
                elif k <= 4:
                    call("wax_search", {"query": f"topic-{i % 9} soak"})
                elif k == 5:
                    call("wax_recall", {"query": f"what was round {max(0, r - 1)} about"})
                elif remembered:
                    call("wax_forget", {"frame_id": remembered.pop(0)})
            call("wax_flush", {})
            lat.append((time.perf_counter() - t0) * 1e3 / ops_per_round)
            rss.append(_rss_kb(proc.pid))
            print(f"round {r}: rss {rss[-1] / 1024:.1f} MiB, {lat[-1]:.1f} ms/op", flush=True)
    finally:
        proc.stdin.close()
        proc.wait(timeout=30)

    # least-squares slope over the steady-state tail (skip warmup rounds)
    tail = rss[2:] if len(rss) > 4 else rss
    n = len(tail)
    xbar, ybar = (n - 1) / 2, sum(tail) / n
    denom = sum((i - xbar) ** 2 for i in range(n)) or 1.0
    slope = sum((i - xbar) * (y - ybar) for i, y in enumerate(tail)) / denom
    ok = slope <= rss_slope_gate_kb
    print(
        f"RSS slope {slope:.1f} KiB/round over {n} steady rounds "
        f"(gate {rss_slope_gate_kb:.0f}) -> {'PASS' if ok else 'FAIL'}"
    )
    report = {
        "mode": "mcp",
        "rounds": rounds,
        "rss_kb": rss,
        "ms_per_op": lat,
        "rss_slope_kb_per_round": slope,
        "gate_kb_per_round": rss_slope_gate_kb,
        "all_ok": ok,
    }
    if out:
        Path(out).write_text(json.dumps(report, indent=2))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", default="smoke", choices=["smoke", "standard", "stress"])
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--out", default=None, help="write the aggregated JSON report here")
    ap.add_argument("--mcp-rounds", type=int, default=0,
                    help="long-running MCP-server soak: N traffic rounds with an RSS drift gate")
    ap.add_argument("--mcp-ops", type=int, default=60, help="ops per MCP soak round")
    ap.add_argument("--rss-gate-kb", type=float, default=2048.0,
                    help="max steady-state RSS growth per round (KiB)")
    args = ap.parse_args()

    if args.mcp_rounds:
        return mcp_soak(args.mcp_rounds, args.mcp_ops, args.rss_gate_kb, args.out)

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
