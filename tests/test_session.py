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
