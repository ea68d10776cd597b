#!/usr/bin/env python
"""Extended model-based store fuzz: many seeds x longer walks.

Drives tests/test_store_model.run_walk (put/put_batch/delete/supersede/commit/
WAL-reopen against a reference model, deep-verified end states) far past the CI
sample — a soak-grade sweep of the WXS1 write path (reference: the spirit of
DurabilityRegressionTests' operation matrices at scale).

    python scripts/store_fuzz.py [N_SEEDS] [STEPS] [SEED0]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.test_store_model import run_walk  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 250
SEED0 = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

t0 = time.time()
fails = 0
with tempfile.TemporaryDirectory() as d:
    for i in range(N):
        seed = SEED0 + i
        path = Path(d) / f"walk{seed}.wxs"
        try:
            run_walk(path, seed, steps=STEPS)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            fails += 1
            print(f"FAIL seed={seed}: {type(e).__name__}: {e}", flush=True)
        finally:
            for p in Path(d).glob(f"walk{seed}.wxs*"):
                p.unlink(missing_ok=True)
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{N} seeds, {fails} failures, {time.time() - t0:.0f}s", flush=True)

print(f"store_fuzz: {N} seeds x {STEPS} steps, {fails} failures, {time.time() - t0:.0f}s")
sys.exit(1 if fails else 0)
