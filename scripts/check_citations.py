"""Citation hygiene checker: every path cited in a docstring must resolve.

The repo's parity-audit mechanism is the `(reference: Sources/...file.swift:line)`
docstring convention (CLAUDE.md) plus intra-repo path mentions (e.g. "see
wax_tpu/orchestrator/serialization.py"). A dangling citation silently breaks the
audit trail, so this script fails (exit 1) on:

  1. any `Sources/...` reference citation whose file does not exist under the
     reference checkout (skipped when the checkout is absent — deployment hosts
     don't carry it; CI in the build environment does);
  2. any intra-repo path mention (wax_tpu/, scripts/, tests/, docs/, examples/)
     that does not exist in the repo.

Scans all tracked *.py / *.md / *.cpp sources. Run directly or via
tests/test_citations.py.
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REFERENCE = os.environ.get("WAX_TPU_REFERENCE_DIR", "/root/reference")

_REF_RE = re.compile(r"(?:[A-Za-z0-9_]+/)*Sources/[A-Za-z0-9_/+.-]+\.(?:swift|metal|c|h)\b")
_REPO_RE = re.compile(
    r"\b(?:wax_tpu|scripts|tests|docs|examples)/[A-Za-z0-9_/.-]+\.(?:py|md|cpp|json|txt)\b"
)
# "..." ellipsis citations name a directory family, not a concrete file
_ELLIPSIS = "..."

SCAN_DIRS = ("wax_tpu", "scripts", "tests", "docs", "examples", "skills")
SCAN_TOP = ("bench.py", "__graft_entry__.py", "README.md", "PARITY.md", "CLAUDE.md")
_EXTS = (".py", ".md", ".cpp", ".c", ".h")


def _iter_files():
    for top in SCAN_TOP:
        p = os.path.join(REPO, top)
        if os.path.exists(p):
            yield p
    for d in SCAN_DIRS:
        for root, dirs, files in os.walk(os.path.join(REPO, d)):
            dirs[:] = [x for x in dirs if x not in ("__pycache__", ".jax_cache")]
            for f in files:
                if f.endswith(_EXTS):
                    yield os.path.join(root, f)


def check() -> list[str]:
    problems: list[str] = []
    have_ref = os.path.isdir(REFERENCE)
    for path in _iter_files():
        rel = os.path.relpath(path, REPO)
        try:
            with open(path, encoding="utf-8", errors="replace") as fh:
                text = fh.read()
        except OSError as e:  # pragma: no cover
            problems.append(f"{rel}: unreadable ({e})")
            continue
        for lineno, line in enumerate(text.splitlines(), 1):
            if have_ref:
                for m in _REF_RE.finditer(line):
                    cited = m.group(0)
                    if _ELLIPSIS in cited:
                        continue
                    if not os.path.exists(os.path.join(REFERENCE, cited)):
                        problems.append(f"{rel}:{lineno}: dangling reference citation {cited}")
            for m in _REPO_RE.finditer(line):
                cited = m.group(0)
                if _ELLIPSIS in cited:
                    continue
                if os.path.exists(os.path.join(REPO, cited)):
                    continue
                # reference-resident docs (e.g. the reference's docs/wax-mcp-setup.md)
                # are legitimate citations too
                if have_ref and os.path.exists(os.path.join(REFERENCE, cited)):
                    continue
                problems.append(f"{rel}:{lineno}: dangling repo path {cited}")
    return problems


def main() -> int:
    problems = check()
    for p in problems:
        print(p, file=sys.stderr)
    if problems:
        print(f"{len(problems)} dangling citation(s)", file=sys.stderr)
        return 1
    print("citations ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
