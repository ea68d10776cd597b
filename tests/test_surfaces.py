"""Product surfaces: MCP server protocol + tool dispatch, CLI commands.

Mirrors the reference's MCP tool surface (ToolSchemas.swift:13-107) and WaxCLI flows.
"""
import io
import json

import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.surfaces.cli import main as cli_main
from wax_tpu.surfaces.mcp_server import McpServer


@pytest.fixture()
def server(tmp_path):
    cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))
    orch = MemoryOrchestrator(tmp_path / "m.wxs", HashEmbedder(64), cfg)
    yield McpServer(orch)
    orch.close()


def _rpc(server, method, params=None, mid=1):
    return server.handle({"jsonrpc": "2.0", "id": mid, "method": method, "params": params or {}})


def _call(server, tool, args):
    resp = _rpc(server, "tools/call", {"name": tool, "arguments": args})
    assert "error" not in resp, resp
    return json.loads(resp["result"]["content"][0]["text"])


class TestMcpProtocol:
    def test_initialize(self, server):
        resp = _rpc(server, "initialize")
        assert resp["result"]["serverInfo"]["name"] == "wax-tpu"

    def test_tools_list_includes_structured(self, server):
        resp = _rpc(server, "tools/list")
        names = {t["name"] for t in resp["result"]["tools"]}
        assert {"wax_remember", "wax_recall", "wax_search", "wax_flush", "wax_stats",
                "wax_handoff", "wax_entity_upsert", "wax_fact_assert", "wax_facts_query"} <= names

    def test_unknown_method_error(self, server):
        resp = _rpc(server, "bogus/method")
        assert resp["error"]["code"] == -32601

    def test_notification_returns_none(self, server):
        assert server.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None

    def test_serve_stdio_roundtrip(self, server):
        lines = [
            json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}),
            json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                        "params": {"name": "wax_remember", "arguments": {"content": "stdio memory"}}}),
        ]
        out = io.StringIO()
        server.serve_stdio(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
        responses = [json.loads(l) for l in out.getvalue().strip().splitlines()]
        assert responses[0]["id"] == 1
        body = json.loads(responses[1]["result"]["content"][0]["text"])
        assert body["document_id"] >= 0


class TestMcpTools:
    def test_remember_search_recall_cycle(self, server):
        _call(server, "wax_remember", {"content": "The launch code is bravo-seven."})
        hits = _call(server, "wax_search", {"query": "launch code"})["hits"]
        assert hits
        ctx = _call(server, "wax_recall", {"query": "what is the launch code"})
        assert "bravo-seven" in ctx["context"]

    def test_flush_stats(self, server):
        _call(server, "wax_remember", {"content": "to be flushed"})
        out = _call(server, "wax_flush", {})
        assert out["generation"] >= 1
        stats = _call(server, "wax_stats", {})
        assert stats["lex_docs"] >= 1

    def test_structured_cycle(self, server):
        r = _call(server, "wax_remember", {"content": "Rex belongs to Ana."})
        _call(server, "wax_entity_upsert", {"name": "Rex", "kind": "pet"})
        f = _call(server, "wax_fact_assert", {
            "subject": "Rex", "predicate": "owner", "value": "Ana",
            "evidence_frames": [r["document_id"]],
        })
        rows = _call(server, "wax_facts_query", {"subject": "Rex"})["facts"]
        assert rows and rows[0]["value"] == "Ana"
        assert _call(server, "wax_fact_retract", {"fact_id": f["fact_id"]})["retracted"]

    def test_handoff_cycle(self, server):
        _call(server, "wax_session_start", {"name": "s1"})
        _call(server, "wax_handoff", {"content": "state snapshot"})
        latest = _call(server, "wax_handoff_latest", {})
        assert latest["found"] and latest["content"] == "state snapshot"

    def test_session_end_stops_tagging(self, server):
        _call(server, "wax_session_start", {"name": "s2"})
        tagged = _call(server, "wax_remember", {"content": "tagged during session s2"})
        assert _call(server, "wax_session_end", {})["ok"]
        untagged = _call(server, "wax_remember", {"content": "untagged after session end"})
        tags_in = server.orch.store.frame_meta(tagged["document_id"]).tags
        tags_out = server.orch.store.frame_meta(untagged["document_id"]).tags
        assert any(str(t).startswith("session:") for t in tags_in)
        assert not any(str(t).startswith("session:") for t in tags_out)

    def test_entity_resolve_roundtrip(self, server):
        _call(server, "wax_entity_upsert", {"name": "Aurora Station", "aliases": ["the station"]})
        byname = _call(server, "wax_entity_resolve", {"name": "Aurora Station"})
        byalias = _call(server, "wax_entity_resolve", {"name": "the station"})
        assert byname["entity_id"] is not None
        assert byname["entity_id"] == byalias["entity_id"]
        missing = _call(server, "wax_entity_resolve", {"name": "no such thing"})
        assert missing["entity_id"] is None

    def test_forget_and_timeline(self, server):
        r = _call(server, "wax_remember", {"content": "ephemeral"})
        tl = _call(server, "wax_timeline", {})
        assert any(f["frame_id"] == r["document_id"] for f in tl["frames"])
        assert _call(server, "wax_forget", {"frame_id": r["document_id"]})["deleted"]

    def test_search_filters_and_diagnostics(self, server):
        a = _call(server, "wax_remember", {"content": "deploy notes for api", "metadata": {"team": "api"}})
        _call(server, "wax_remember", {"content": "deploy notes for web", "metadata": {"team": "web"}})
        hits = _call(
            server, "wax_search",
            {"query": "deploy notes", "metadata_filter": {"team": "api"}, "include_diagnostics": True},
        )
        assert hits["hits"], hits
        assert all(h["frame_id"] != a["document_id"] or "diagnostics" in h for h in hits["hits"])
        ids = {h["frame_id"] for h in hits["hits"]}
        assert a["document_id"] in ids and len(ids) == 1  # web frame filtered out
        d = hits["hits"][0]["diagnostics"]
        assert "lane_ranks" in d and "rrf_score" in d and "tie_break" in d
        assert "lane_counts" in hits
        # frame_ids restriction
        only = _call(server, "wax_search", {"query": "deploy notes", "frame_ids": [a["document_id"]]})
        assert {h["frame_id"] for h in only["hits"]} <= {a["document_id"]}

    def test_tool_error_is_jsonrpc_error(self, server):
        resp = _rpc(server, "tools/call", {"name": "wax_nonexistent", "arguments": {}})
        assert "error" in resp

    def test_video_tools(self, server):
        out = _call(server, "wax_video_ingest", {
            "video_id": "v1",
            "duration_ms": 20_000,
            "transcript": [
                {"start_ms": 0, "end_ms": 9_000, "text": "intro to gardening"},
                {"start_ms": 10_000, "end_ms": 19_000, "text": "pruning roses properly"},
            ],
        })
        assert len(out["segment_frames"]) == 2
        hits = _call(server, "wax_video_recall", {"query": "pruning roses"})["hits"]
        assert hits and hits[0]["segment_index"] == 1

    def test_photo_tools(self, server):
        _call(server, "wax_photo_ingest", {
            "asset_id": "p1",
            "caption": "sunset over the harbor with sailboats",
            "ocr_texts": ["PIER 39"],
            "gps": [37.80, -122.41],
            "taken_at_ms": 1_700_000_000_000,
        })
        hits = _call(server, "wax_photo_recall", {"query": "harbor sailboats sunset"})["hits"]
        assert hits and hits[0]["asset_id"] == "p1"
        hits2 = _call(server, "wax_photo_recall", {"query": "pier sign", "near": [37.8001, -122.4102]})["hits"]
        assert hits2 and hits2[0]["asset_id"] == "p1"

    def test_multimodal_forget(self, server):
        _call(server, "wax_video_ingest", {
            "video_id": "vdel",
            "duration_ms": 10_000,
            "transcript": [{"start_ms": 0, "end_ms": 9_000, "text": "deletable clip"}],
        })
        assert _call(server, "wax_video_forget", {"video_id": "vdel"})["deleted"]
        assert not _call(server, "wax_video_forget", {"video_id": "vdel"})["deleted"]
        assert not any(
            h["video_id"] == "vdel" for h in _call(server, "wax_video_recall", {"query": "deletable clip"})["hits"]
        )
        _call(server, "wax_photo_ingest", {"asset_id": "pdel", "caption": "deletable photo"})
        assert _call(server, "wax_photo_forget", {"asset_id": "pdel"})["deleted"]
        assert not any(
            h["asset_id"] == "pdel" for h in _call(server, "wax_photo_recall", {"query": "deletable photo"})["hits"]
        )


class TestCli:
    def test_remember_search_verify(self, tmp_path, capsys):
        store = str(tmp_path / "cli.wxs")
        assert cli_main(["remember", "the cli stores this memory", "--store", store]) == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["document_id"] == 0
        assert cli_main(["search", "cli memory", "--store", store]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert json.loads(lines[0])["frame_id"] == 0
        assert cli_main(["verify", "--deep", "--store", store]) == 0
        assert json.loads(capsys.readouterr().out.strip())["ok"]

    def test_stats(self, tmp_path, capsys):
        store = str(tmp_path / "cli.wxs")
        cli_main(["remember", "something", "--store", store])
        capsys.readouterr()
        assert cli_main(["stats", "--store", store]) == 0
        stats = json.loads(capsys.readouterr().out)
        assert stats["store"]["frame_count"] >= 1

    def test_mcp_install_uninstall(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        assert cli_main(["mcp", "install", "--store", str(tmp_path / "s.wxs")]) == 0
        cfg = json.loads((tmp_path / ".mcp.json").read_text())
        assert "wax-tpu" in cfg["mcpServers"]
        assert cli_main(["mcp", "uninstall"]) == 0
        cfg = json.loads((tmp_path / ".mcp.json").read_text())
        assert "wax-tpu" not in cfg["mcpServers"]

    def test_mcp_doctor(self, tmp_path, capsys):
        assert cli_main(["mcp", "doctor", "--store", str(tmp_path / "s.wxs")]) == 0
        assert "[ok] jax" in capsys.readouterr().out

    def test_mcp_doctor_wedged_backend_fails_bounded(self, tmp_path, monkeypatch, capsys):
        """On a wedged TPU tunnel doctor must FAIL the devices check with a
        diagnosis inside the timeout, not hang in the platform plugin's init
        retry loop — and exit non-zero."""
        import jax

        import wax_tpu.utils.backend as backend_mod

        # force the subprocess-probe path (in tests jax_platforms is "cpu")
        monkeypatch.setattr(
            type(jax.config), "jax_platforms", property(lambda self: ""), raising=False
        )
        monkeypatch.setattr(
            backend_mod,
            "probe_backend",
            lambda timeout_s: (None, f"backend init exceeded {timeout_s:.0f}s (tunnel wedged)"),
        )
        assert cli_main(["mcp", "doctor", "--store", str(tmp_path / "s.wxs")]) == 1
        out = capsys.readouterr().out
        assert "[FAIL] devices" in out and "tunnel wedged" in out


class TestBackendProbe:
    """wax_tpu.utils.backend.probe_backend result parsing (subprocess mocked —
    the real child would re-init whatever platform the env forces)."""

    def _run(self, monkeypatch, runner):
        import subprocess

        import wax_tpu.utils.backend as backend_mod

        monkeypatch.setattr(backend_mod.subprocess, "run", runner)
        return backend_mod.probe_backend(5.0)

    def test_timeout_reports_wedged(self, monkeypatch):
        import subprocess

        def runner(*a, **kw):
            raise subprocess.TimeoutExpired(cmd="x", timeout=5.0)

        devices, err = self._run(monkeypatch, runner)
        assert devices is None and "exceeded 5s" in err and "wedged" in err

    def test_nonzero_rc_reports_stderr_tail(self, monkeypatch):
        class R:
            returncode = 1
            stdout = ""
            stderr = "Traceback ...\nRuntimeError: Backend 'axon' failed to initialize"

        devices, err = self._run(monkeypatch, lambda *a, **kw: R())
        assert devices is None and err == "RuntimeError: Backend 'axon' failed to initialize"

    def test_success_returns_device_list(self, monkeypatch):
        class R:
            returncode = 0
            stdout = "some preamble\n['TPU_0(process=0,(0,0,0,0))']\n"
            stderr = ""

        devices, err = self._run(monkeypatch, lambda *a, **kw: R())
        assert err is None and devices == "['TPU_0(process=0,(0,0,0,0))']"
