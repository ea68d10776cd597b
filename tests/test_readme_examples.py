"""README snippets must run (reference: READMEExamplesTests compiles/runs README
snippets). Extracts python code fences from README.md and executes them in order in a
shared namespace, with store paths redirected into tmp."""
import re
from pathlib import Path

import pytest

README = Path(__file__).parent.parent / "README.md"


def test_readme_python_examples(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    text = README.read_text()
    # blockquoted fences (> ```python) carry a "> " prefix on every line — strip it
    blocks = [
        re.sub(r"(?m)^> ?", "", b)
        for b in re.findall(r"```python\n(.*?)```", text, re.DOTALL)
    ]
    assert blocks, "README must contain python examples"
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"README-block-{i}", "exec"), ns)  # noqa: S102
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"README block {i} failed: {type(e).__name__}: {e}\n{block}")
