"""WaxSession mid-level API: put/search/commit round-trips, read-only sessions
(reference: WaxSessionTests)."""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.session import open_session
from wax_tpu.storage.store import StoreError, StoreOptions

OPTS = StoreOptions(wal_size=512 * 1024)
EMB = HashEmbedder(64)


class TestSession:
    def test_put_search_commit_reopen(self, tmp_path):
        p = tmp_path / "s.wxs"
        with open_session(p, dim=64, options=OPTS) as s:
            fid = s.put("the session api stores this", embedding=EMB.embed("the session api stores this"))
            resp = s.search("session api")
            assert resp.hits and resp.hits[0].frame_id == fid
            s.commit()
        with open_session(p, dim=64, options=OPTS) as s2:
            resp = s2.search("session api stores")
            assert resp.hits and resp.hits[0].frame_id == fid

    def test_put_batch_with_embeddings(self, tmp_path):
        texts = ["alpha doc", "beta doc", "gamma doc"]
        with open_session(tmp_path / "b.wxs", dim=64, options=OPTS) as s:
            fids = s.put_batch(texts, embeddings=EMB.embed_batch(texts))
            assert len(fids) == 3
            assert s.search("beta").hits[0].frame_id == fids[1]

    def test_delete(self, tmp_path):
        with open_session(tmp_path / "d.wxs", dim=64, options=OPTS) as s:
            fid = s.put("to be deleted")
            assert s.delete(fid)
            assert all(h.frame_id != fid for h in s.search("deleted").hits)

    def test_readonly_session(self, tmp_path):
        p = tmp_path / "r.wxs"
        with open_session(p, dim=64, options=OPTS) as s:
            s.put("readable memory", embedding=EMB.embed("readable memory"))
            s.commit()
        ro = open_session(p, dim=64, options=OPTS, readonly=True)
        try:
            assert ro.readonly
            assert ro.search("readable").hits
            with pytest.raises(StoreError):
                ro.put("nope")
        finally:
            ro.close()

    def test_pending_embeddings_survive_without_commit(self, tmp_path):
        p = tmp_path / "w.wxs"
        s = open_session(p, dim=64, options=OPTS)
        s.put("journaled only", embedding=EMB.embed("journaled only"))
        s.close()
        with open_session(p, dim=64, options=OPTS) as s2:
            assert len(s2.engine.vector) == 1
            assert s2.search("journaled").hits

    def test_recovered_frames_reindexed_into_lex(self, tmp_path):
        # Regression: WAL-recovered pending frames were replayed into the vector
        # engine but never re-indexed into the lex builder, so the next commit()
        # persisted a lex segment durably missing them (BM25 returned 0 hits).
        p = tmp_path / "lexcatchup.wxs"
        s = open_session(p, dim=64, options=OPTS)
        fid = s.put("zanzibar spice warehouse ledger", embedding=EMB.embed("zanzibar"))
        s.close()  # no commit: the frame exists only in the WAL
        with open_session(p, dim=64, options=OPTS) as s2:
            resp = s2.search("zanzibar warehouse")
            assert resp.hits and resp.hits[0].frame_id == fid
            s2.commit()
        with open_session(p, dim=64, options=OPTS) as s3:
            resp = s3.search("zanzibar warehouse")
            assert resp.hits and resp.hits[0].frame_id == fid
            assert any(src.value == "bm25" for src in resp.hits[0].sources)


class TestSessionMatrix:
    """Deeper WaxSession flows (reference: WaxSessionTests breadth)."""

    def test_wal_recovered_puts_visible_and_lex_caught_up(self, tmp_path):
        """Un-committed puts journal in the WAL; a new session must see them in
        BM25 (the lex catch-up) AND persist them at its own commit."""
        p = tmp_path / "wal.wxs"
        s = open_session(p, dim=64, options=OPTS)
        s.put("uncommitted walrus fact", embedding=EMB.embed("uncommitted walrus fact"))
        s.store.close()  # close WITHOUT commit: state lives only in the WAL
        with open_session(p, dim=64, options=OPTS) as s2:
            assert s2.search("walrus").hits, "WAL-recovered frame invisible to BM25"
            s2.commit()
        with open_session(p, dim=64, options=OPTS) as s3:
            assert s3.search("walrus").hits

    def test_upsert_same_frame_id_via_delete_put(self, tmp_path):
        with open_session(tmp_path / "u.wxs", dim=64, options=OPTS) as s:
            fid = s.put("old crocodile info", embedding=EMB.embed("old crocodile info"))
            s.delete(fid)
            fid2 = s.put("new crocodile info", embedding=EMB.embed("new crocodile info"))
            hits = s.search("crocodile info").hits
            assert [h.frame_id for h in hits] == [fid2]

    def test_binary_content_not_text_indexed(self, tmp_path):
        with open_session(tmp_path / "bin.wxs", dim=64, options=OPTS) as s:
            fid = s.put(b"\x00\x01\x02binaryblob", index_text=False)
            assert s.store.frame_content(fid) == b"\x00\x01\x02binaryblob"
            resp = s.search("binaryblob")
            # not lexically indexed: any hit comes from the timeline FALLBACK lane
            assert resp.lane_counts["bm25"] == 0
            from wax_tpu.types import LaneSource

            assert all(h.sources == (LaneSource.TEMPORAL,) for h in resp.hits)

    def test_commit_persists_both_engines(self, tmp_path):
        p = tmp_path / "both.wxs"
        with open_session(p, dim=64, options=OPTS) as s:
            s.put("vector and text doc", embedding=EMB.embed("vector and text doc"))
            s.commit()
        with open_session(p, dim=64, options=OPTS) as s2:
            m = s2.store.toc.manifests
            assert "lex" in m and "vec" in m
            from wax_tpu.types import SearchMode, SearchRequest

            assert s2.search(SearchRequest(query="vector text", mode=SearchMode.TEXT_ONLY)).hits
            q = EMB.embed("vector and text doc")
            assert s2.search(SearchRequest(query="vector and text doc", embedding=q,
                                           mode=SearchMode.VECTOR_ONLY)).hits

    def test_vector_preference_hnsw(self, tmp_path):
        with open_session(tmp_path / "h.wxs", dim=64, options=OPTS, vector_preference="hnsw") as s:
            texts = [f"hnsw doc {i}" for i in range(50)]
            s.put_batch(texts, embeddings=EMB.embed_batch(texts))
            assert s.engine.vector.kind == "hnsw"
            assert s.search("hnsw doc 7").hits
            s.commit()
        with open_session(tmp_path / "h.wxs", dim=64, options=OPTS, vector_preference="hnsw") as s2:
            assert s2.engine.vector.kind == "hnsw"
            assert s2.search("hnsw doc").hits

    def test_double_commit_stable(self, tmp_path):
        p = tmp_path / "dc.wxs"
        with open_session(p, dim=64, options=OPTS) as s:
            s.put("stable doc", embedding=EMB.embed("stable doc"))
            g1 = s.commit()
            g2 = s.commit()
            assert g2 > g1  # commits are new generations even without new writes
        with open_session(p, dim=64, options=OPTS) as s2:
            assert s2.search("stable doc").hits

    def test_put_batch_metadata_rows(self, tmp_path):
        with open_session(tmp_path / "md.wxs", dim=64, options=OPTS) as s:
            fids = s.put_batch(["one fish", "two fish"], metadatas=[{"n": "1"}, {"n": "2"}])
            assert s.store.frame_meta(fids[0]).metadata["n"] == "1"
            assert s.store.frame_meta(fids[1]).metadata["n"] == "2"


class TestSessionAnalyzerGuard:
    def test_stale_analyzer_segment_rebuilds_not_restamps(self, tmp_path, monkeypatch, caplog):
        """A session opening a store whose lex segment was tokenized by a
        different analyze() must rebuild from frames — and crucially its
        commit() must then persist the REBUILT vocab, not re-stamp the stale
        one with the current version string (which would mask the mismatch
        for every later open)."""
        import logging

        import wax_tpu.index.lex as lexmod

        p = tmp_path / "stale.wxs"
        with open_session(p, dim=64, options=OPTS) as s:
            fid = s.put("stale analyzer guard document", embedding=EMB.embed("x"))
            s.commit()
        # pretend the runtime analyzer moved on after the store was written
        monkeypatch.setattr(lexmod, "ANALYZER_VERSION", "u61-next")
        with caplog.at_level(logging.WARNING, logger="wax_tpu"):
            with open_session(p, dim=64, options=OPTS) as s2:
                resp = s2.search("analyzer guard")
                assert resp.hits and resp.hits[0].frame_id == fid  # rebuilt index serves
                assert any("analyzer" in r.message for r in caplog.records)  # guard fired
                s2.put("second doc after rebuild", embedding=EMB.embed("y"))
                s2.commit()  # persists the rebuilt vocab stamped u61-next
        # reopen STILL under u61-next: segment now current, loads without rebuild
        with open_session(p, dim=64, options=OPTS) as s3:
            attrs = s3.store.toc.manifests["lex"].attrs
            assert attrs["analyzer"] == "u61-next"
            assert s3.search("second doc").hits

    def test_stale_segment_is_rejected_without_reading_the_blob(self):
        """The analyzer check lives on the MANIFEST; a stale (or absent) lex
        segment must cost zero segment IO at open — a read-only session re-pays
        the open path every time, so the wasted multi-MB read would recur."""
        from wax_tpu.orchestrator.serialization import load_lex_if_current

        class Man:
            attrs = {"analyzer": "ancient"}

        class Store:
            def read_segment(self, name):
                raise AssertionError("stale segment blob must not be read")

        builder, stale = load_lex_if_current(Store(), Man())
        assert builder is None and stale
        assert load_lex_if_current(Store(), None) == (None, False)
