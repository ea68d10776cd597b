"""MCP protocol-level error paths: bad args, unknown tools, feature gating,
license gating, closed stores, malformed frames.

Mirrors the reference's MCP error-handling breadth (reference:
Tests/WaxIntegrationTests — server-side tool failure suites; ToolSchemas.swift
required-argument contracts; LicenseValidator.swift gating).
"""
import io
import json

import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.surfaces.license import issue_license
from wax_tpu.surfaces.mcp_server import McpServer, build_server


@pytest.fixture()
def server(tmp_path):
    cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))
    orch = MemoryOrchestrator(tmp_path / "m.wxs", HashEmbedder(64), cfg)
    srv = McpServer(orch)
    yield srv
    orch.close()


@pytest.fixture()
def server_no_structured(tmp_path):
    cfg = OrchestratorConfig(
        store=StoreOptions(wal_size=512 * 1024), enable_structured_memory=False
    )
    orch = MemoryOrchestrator(tmp_path / "ns.wxs", HashEmbedder(64), cfg)
    srv = McpServer(orch, structured_enabled=False)
    yield srv
    orch.close()


def _rpc(server, method, params=None, mid=1):
    return server.handle({"jsonrpc": "2.0", "id": mid, "method": method, "params": params or {}})


def _call_raw(server, tool, args, mid=7):
    return _rpc(server, "tools/call", {"name": tool, "arguments": args}, mid=mid)


class TestBadArguments:
    def test_unknown_tool(self, server):
        resp = _call_raw(server, "wax_no_such_tool", {})
        assert resp["error"]["code"] == -32603
        assert "unknown tool" in resp["error"]["message"]

    def test_remember_missing_content(self, server):
        resp = _call_raw(server, "wax_remember", {})
        assert "error" in resp and "KeyError" in resp["error"]["message"]

    def test_search_missing_query(self, server):
        resp = _call_raw(server, "wax_search", {})
        assert "error" in resp

    def test_search_bad_top_k_type(self, server):
        resp = _call_raw(server, "wax_search", {"query": "x", "top_k": "lots"})
        assert "error" in resp

    def test_recall_bad_top_k_type(self, server):
        resp = _call_raw(server, "wax_recall", {"query": "x", "top_k": "many"})
        assert "error" in resp

    def test_unknown_extra_args_ignored(self, server):
        resp = _call_raw(server, "wax_recall", {"query": "x", "max_tokens": "ignored"})
        assert "error" not in resp  # JSON-RPC tolerance: unknown args are dropped

    def test_fact_assert_missing_fields(self, server):
        resp = _call_raw(server, "wax_fact_assert", {"entity": "only-entity"})
        assert "error" in resp

    def test_forget_nonexistent_frame(self, server):
        resp = _call_raw(server, "wax_forget", {"frame_id": 999999})
        # graceful result or structured error — never a crash of the loop
        assert ("error" in resp) or ("result" in resp)

    def test_error_keeps_request_id(self, server):
        resp = _call_raw(server, "wax_no_such_tool", {}, mid="string-id-42")
        assert resp["id"] == "string-id-42"

    def test_server_survives_error_and_serves_next(self, server):
        _call_raw(server, "wax_remember", {})  # error
        ok = _call_raw(server, "wax_remember", {"content": "after the error"})
        assert "error" not in ok


class TestFeatureGating:
    def test_structured_tools_hidden(self, server_no_structured):
        names = {t["name"] for t in _rpc(server_no_structured, "tools/list")["result"]["tools"]}
        assert not any(n.startswith("wax_entity") or n.startswith("wax_fact") for n in names)

    def test_structured_tool_dispatch_refused(self, server_no_structured):
        resp = _call_raw(server_no_structured, "wax_entity_upsert", {"name": "Ada"})
        assert "error" in resp
        assert "disabled" in resp["error"]["message"]

    def test_structured_enabled_lists_and_works(self, server):
        names = {t["name"] for t in _rpc(server, "tools/list")["result"]["tools"]}
        assert "wax_entity_upsert" in names
        resp = _call_raw(server, "wax_entity_upsert", {"name": "Ada"})
        assert "error" not in resp


class TestLicenseGating:
    def test_disabled_by_default(self, tmp_path, monkeypatch):
        monkeypatch.delenv("WAX_TPU_FEATURE_LICENSE", raising=False)
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        srv = build_server(tmp_path / "lic0.wxs")
        try:
            assert _rpc(srv, "ping")["result"] == {}
        finally:
            srv.close()

    def test_enabled_without_token_refuses(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_FEATURE_LICENSE", "1")
        monkeypatch.delenv("WAX_TPU_LICENSE", raising=False)
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        with pytest.raises(PermissionError):
            build_server(tmp_path / "lic1.wxs")

    def test_enabled_with_bad_signature_refuses(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_FEATURE_LICENSE", "1")
        monkeypatch.setenv("WAX_TPU_LICENSE", issue_license("mallory", "wrong-secret"))
        monkeypatch.setenv("WAX_TPU_LICENSE_SECRET", "real-secret")
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        with pytest.raises(PermissionError, match="signature"):
            build_server(tmp_path / "lic2.wxs")

    def test_enabled_with_valid_token_builds(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_FEATURE_LICENSE", "1")
        monkeypatch.setenv("WAX_TPU_LICENSE", issue_license("alice", "s3cret"))
        monkeypatch.setenv("WAX_TPU_LICENSE_SECRET", "s3cret")
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        srv = build_server(tmp_path / "lic3.wxs")
        try:
            out = _call_raw(srv, "wax_remember", {"content": "licensed memory"})
            assert "error" not in out
        finally:
            srv.close()

    def test_expired_token_refuses(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_FEATURE_LICENSE", "1")
        monkeypatch.setenv("WAX_TPU_LICENSE", issue_license("bob", "k", expires_ms=1))
        monkeypatch.setenv("WAX_TPU_LICENSE_SECRET", "k")
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        with pytest.raises(PermissionError, match="expired"):
            build_server(tmp_path / "lic4.wxs")


class TestClosedStore:
    def test_call_after_close_is_structured_error(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))
        orch = MemoryOrchestrator(tmp_path / "c.wxs", HashEmbedder(64), cfg)
        srv = McpServer(orch)
        orch.close()
        resp = _call_raw(srv, "wax_remember", {"content": "too late"})
        assert "error" in resp
        assert resp["error"]["code"] == -32603

    def test_search_after_close(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))
        orch = MemoryOrchestrator(tmp_path / "c2.wxs", HashEmbedder(64), cfg)
        orch.remember("persisted before close")
        orch.flush()
        srv = McpServer(orch)
        orch.close()
        resp = _call_raw(srv, "wax_search", {"query": "persisted"})
        assert "error" in resp


class TestStdioRobustness:
    def test_malformed_lines_skipped(self, server):
        lines = [
            "this is not json",
            '{"jsonrpc": "2.0"',  # truncated
            "",
            json.dumps({"jsonrpc": "2.0", "id": 5, "method": "ping", "params": {}}),
        ]
        out = io.StringIO()
        server.serve_stdio(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
        responses = [json.loads(l) for l in out.getvalue().strip().splitlines()]
        assert len(responses) == 1 and responses[0]["id"] == 5

    def test_notification_produces_no_output(self, server):
        lines = [
            json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
            json.dumps({"jsonrpc": "2.0", "method": "tools/call",
                        "params": {"name": "wax_no_such_tool", "arguments": {}}}),
        ]
        out = io.StringIO()
        server.serve_stdio(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
        assert out.getvalue().strip() == ""

    def test_non_dict_params_is_error_not_crash(self, server):
        resp = server.handle({"jsonrpc": "2.0", "id": 9, "method": "tools/call", "params": None})
        assert "error" in resp and resp["id"] == 9

    def test_unicode_content_roundtrip(self, server):
        content = "日本語のメモ 🚀 café naïve"
        r = _call_raw(server, "wax_remember", {"content": content})
        assert "error" not in r
        _call_raw(server, "wax_flush", {})
        got = _call_raw(server, "wax_search", {"query": "café"})
        assert "error" not in got


class TestMultimodalToolErrors:
    def test_video_recall_before_ingest(self, server):
        resp = _call_raw(server, "wax_video_recall", {"query": "anything"})
        assert ("error" in resp) or (
            json.loads(resp["result"]["content"][0]["text"]).get("hits") == []
        )

    def test_photo_ingest_missing_asset(self, server):
        resp = _call_raw(server, "wax_photo_ingest", {})
        assert "error" in resp

    def test_video_forget_unknown_id(self, server):
        resp = _call_raw(server, "wax_video_forget", {"video_id": "nope"})
        assert ("error" in resp) or ("result" in resp)


class TestEmbedderAutoSelection:
    def test_existing_hash_store_not_bricked_by_fetched_weights(self, tmp_path, monkeypatch):
        """Round-3 regression: fetching MiniLM weights must not make the server
        refuse to boot on a store built with the hash embedder — auto keeps the
        store's provider and logs the migration path instead."""
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "auto")
        monkeypatch.delenv("WAX_TPU_MINILM_DIR", raising=False)
        p = tmp_path / "auto.wxs"
        srv = build_server(p)
        _call_raw(srv, "wax_remember", {"content": "built under hash"})
        _call_raw(srv, "wax_flush", {})
        srv.close()
        # "weights appear" (the dir existing is what flips auto's preference)
        fake_ckpt = tmp_path / "minilm"
        fake_ckpt.mkdir()
        monkeypatch.setenv("WAX_TPU_MINILM_DIR", str(fake_ckpt))
        srv2 = build_server(p)  # must NOT raise the embedder-mismatch StoreError
        try:
            resp = _call_raw(srv2, "wax_search", {"query": "built under hash"})
            assert "error" not in resp
        finally:
            srv2.close()

    def test_mismatch_env_policy_reindex(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        p = tmp_path / "mig.wxs"
        srv = build_server(p)
        _call_raw(srv, "wax_remember", {"content": "reindex me please"})
        _call_raw(srv, "wax_flush", {})
        srv.close()
        # force a different provider identity + reindex migration policy
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "minilm")
        monkeypatch.setenv("WAX_TPU_EMBEDDER_MISMATCH", "reindex")
        monkeypatch.delenv("WAX_TPU_MINILM_DIR", raising=False)
        srv2 = build_server(p)  # random-init MiniLM + reindex: boots and re-embeds
        try:
            resp = _call_raw(srv2, "wax_search", {"query": "reindex me please"})
            assert "error" not in resp
        finally:
            srv2.close()


class TestScaleEnvKnobs:
    """WAX_TPU_SHARDED_LANES / MESH_SLICES / MESH_TP / POSTINGS_BUDGET reach the
    orchestrator config (serving deployments configure scale via env only)."""

    def test_sharded_two_level_and_budget(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        monkeypatch.setenv("WAX_TPU_SHARDED_LANES", "1")
        monkeypatch.setenv("WAX_TPU_MESH_SLICES", "2")
        monkeypatch.setenv("WAX_TPU_POSTINGS_BUDGET", "auto")
        srv = build_server(tmp_path / "scale.wxs")
        try:
            cfg = srv.orch.config
            assert cfg.sharded_lanes and cfg.mesh_slices == 2 and cfg.mesh_tp == 1
            assert cfg.lex_postings_budget == "auto"
            assert "slice" in srv.orch.engine.mesh.axis_names
            out = _call_raw(srv, "wax_remember", {"content": "sharded serving memory"})
            assert "error" not in out
            out = _call_raw(srv, "wax_search", {"query": "sharded serving"})
            assert "error" not in out
        finally:
            srv.close()

    def test_topology_ignored_without_sharded_flag(self, tmp_path, monkeypatch):
        """Topology vars without WAX_TPU_SHARDED_LANES=1 must not trip the
        config's mesh validation — single-chip default wins."""
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        monkeypatch.delenv("WAX_TPU_SHARDED_LANES", raising=False)
        monkeypatch.setenv("WAX_TPU_MESH_SLICES", "4")
        srv = build_server(tmp_path / "flat.wxs")
        try:
            assert not srv.orch.config.sharded_lanes
            assert srv.orch.config.mesh_slices == 1
        finally:
            srv.close()

    def test_int_budget(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_EMBEDDER", "hash")
        monkeypatch.setenv("WAX_TPU_POSTINGS_BUDGET", "4096")
        srv = build_server(tmp_path / "budget.wxs")
        try:
            assert srv.orch.config.lex_postings_budget == 4096
        finally:
            srv.close()


class TestWarmupGate:
    """The first tools/call waits for the background warmup (bounded), so the
    first agent call never races the lane pre-trace for the compile; initialize
    and tools/list answer immediately while warming (VERDICT r4 #4)."""

    def _slow_warmup(self, orch, done, duration=0.3):
        import threading
        import time as _t

        def _w():
            _t.sleep(duration)
            done.append(True)

        t = threading.Thread(target=_w, daemon=True)
        t.start()
        orch._warmup_thread = t

    def test_first_call_waits_for_warmup(self, server):
        done = []
        self._slow_warmup(server.orch, done)
        resp = _call_raw(server, "wax_stats", {})
        assert "result" in resp
        assert done == [True], "tools/call dispatched before warmup finished"

    def test_initialize_and_list_do_not_wait(self, server):
        done = []
        self._slow_warmup(server.orch, done, duration=5.0)
        assert "result" in _rpc(server, "initialize")
        assert "result" in _rpc(server, "tools/list")
        assert done == [], "initialize/tools/list must not block on warmup"
        server.orch._warmup_thread = None  # don't leak the 5 s join into close()

    def test_gate_is_first_call_only(self, server):
        done = []
        _call_raw(server, "wax_stats", {})  # consumes the gate (no warmup thread)
        self._slow_warmup(server.orch, done, duration=5.0)
        resp = _call_raw(server, "wax_stats", {})
        assert "result" in resp
        assert done == [], "only the FIRST tools/call gates on warmup"
        server.orch._warmup_thread = None

    def test_timeout_bounded(self, server, monkeypatch):
        import time as _t

        self._slow_warmup(server.orch, [], duration=30.0)
        server._warmup_timeout = 0.2
        t0 = _t.perf_counter()
        resp = _call_raw(server, "wax_stats", {})
        assert "result" in resp
        assert _t.perf_counter() - t0 < 5.0, "gate must respect the timeout"
        server.orch._warmup_thread = None

    def test_wait_for_warmup_no_thread(self, server):
        assert server.orch.wait_for_warmup(timeout=0.01) is True
