"""Citation hygiene: every `(reference: ...)` and intra-repo path citation resolves.

The docstring-citation convention is this repo's parity-audit mechanism
(CLAUDE.md); a dangling citation silently breaks the audit trail. Reference-side
checks are skipped when the reference checkout is absent (deployment hosts).
"""
from __future__ import annotations

import importlib.util
import os

import pytest

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "check_citations.py")


def _load():
    spec = importlib.util.spec_from_file_location("check_citations", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_dangling_citations():
    mod = _load()
    problems = mod.check()
    assert problems == [], "\n".join(problems)


def test_reference_checks_active_when_checkout_present():
    mod = _load()
    if not os.path.isdir(mod.REFERENCE):
        pytest.skip("reference checkout absent")
    # sanity: the regexes actually match the conventions in use, so an empty
    # problem list means "checked", not "matched nothing"
    line = "(reference: Sources/WaxTextSearch/FTS5SearchEngine.swift:129)"
    assert mod._REF_RE.search(line)
    assert mod._REF_RE.search("WaxDemo/Sources/WaxDemoCorruptTOC/main.swift")
    assert mod._REPO_RE.search("see wax_tpu/orchestrator/serialization.py for detail")
