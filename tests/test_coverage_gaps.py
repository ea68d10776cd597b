"""Intentional coverage gaps, tracked as assertions (reference: CoverageGapTests —
the reference keeps a test enumerating what is deliberately not covered so gaps are
decisions, not accidents).

Each entry states the gap, why it is intentional in the TPU build, and pins the
behavior that substitutes for it (so if the substitute regresses, this test fails).
"""
import pytest


class TestIntentionalGaps:
    def test_no_blocking_io_executor(self):
        """Reference: BlockingIOExecutor.swift bridges blocking IO into Swift async.
        TPU build: single-controller process, synchronous IO under the orchestrator
        lock — there is no async runtime to bridge. Substitute: the lock exists."""
        from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator

        assert hasattr(MemoryOrchestrator, "_check_writable")
        import threading

        assert threading.RLock is not None

    def test_no_byte_level_mv2s_compat(self):
        """The .wxs format is NOT byte-compatible with .mv2s (out of scope per the
        north star: the storage layer matters as a load path, not a byte format).
        Substitute: same crash-safety recipe, verified by the recovery matrix."""
        from wax_tpu.storage.format import MAGIC

        assert MAGIC == b"WXS1"  # deliberately not b"MV2S"

    def test_no_os_vision_providers(self):
        """Apple Vision OCR / PHAsset / AVFoundation integrations stay host-supplied
        behind protocols (the reference's own provider contracts)."""
        from wax_tpu.multimodal import protocols

        for name in ("OCRProvider", "CaptionProvider", "TranscriptProvider"):
            assert hasattr(protocols, name)

    def test_cl100k_exactness_depends_on_vocab_file(self):
        """Token counts are exact cl100k only when a vocab data file is present;
        otherwise the deterministic byte fallback applies and `exact` is False."""
        from wax_tpu.text.bpe import load_cl100k

        enc = load_cl100k()
        assert isinstance(enc.exact, bool)  # both states are valid deployments

    def test_hnsw_search_is_flat_graph(self):
        """Device beam search runs on the flattened multi-level adjacency instead of
        hierarchical descent (data-dependent control flow is hostile to XLA).
        Substitute: recall parity vs the flat oracle is enforced in test_hnsw.py."""
        from wax_tpu.index.graph import HNSWBuilder

        import numpy as np

        b = HNSWBuilder(dim=8, m=4, ef_construction=16)
        b.add_batch(np.arange(32), np.random.default_rng(0).standard_normal((32, 8)).astype(np.float32))
        g = b.snapshot()
        assert g.adjacency.shape[1] == 3 * b.m  # 2M level-0 + M upper links flattened
