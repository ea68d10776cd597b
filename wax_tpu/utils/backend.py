"""Bounded backend-liveness probe.

A wedged TPU tunnel makes the platform plugin's C-API init retry for many
minutes with no way to interrupt it in-process. Probing `jax.devices()` in a
child process with a hard timeout lets callers (bench.py's one-JSON-line driver
contract, `wax-tpu mcp doctor`) report "tunnel wedged" on a bounded clock
instead of hanging. (reference: the `wax mcp doctor` readiness checks,
Sources/WaxCLI/main.swift — every check there is bounded too.)
"""
from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["probe_backend", "PROBE_TIMEOUT_ENV", "DOCTOR_TIMEOUT_ENV"]

PROBE_TIMEOUT_ENV = "WAX_BENCH_PROBE_TIMEOUT"  # bench.py pre-flight (default 900s)
DOCTOR_TIMEOUT_ENV = "WAX_TPU_DOCTOR_TIMEOUT"  # `wax-tpu mcp doctor` (default 60s)


def probe_backend(timeout_s: float) -> tuple[str | None, str | None]:
    """Probe backend init in a subprocess with a hard timeout.

    Returns ``(devices, error)`` — exactly one is non-None. ``devices`` is the
    child's device-list repr on success; ``error`` is a one-line diagnosis on
    timeout or failed init. The parent's own (unbounded) backend init is only
    safe AFTER a success here.
    """
    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; print([str(d) for d in jax.devices()])",
            ],
            capture_output=True,
            timeout=timeout_s,
            text=True,
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return None, f"backend init exceeded {timeout_s:.0f}s (tunnel wedged)"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return None, (tail[-1] if tail else f"backend init failed (rc={r.returncode})")
    out = (r.stdout or "").strip().splitlines()
    if not out:
        return None, "backend probe produced no output (rc=0)"
    return out[-1], None
