"""Child-process crash campaign: SIGKILL at every commit checkpoint, assert exact
recovered frame counts + generations (reference: WaxCrashHarness/main.swift:24-75)."""
import pytest

from wax_tpu.storage.store import CrashCheckpoint
from wax_tpu.surfaces.crash_harness import SCENARIOS, run_scenario


@pytest.mark.parametrize("checkpoint", list(SCENARIOS))
def test_crash_recovery(checkpoint, tmp_path):
    rep = run_scenario(checkpoint, tmp_path, committed=3, pending=2)
    assert rep["child_killed"], f"child survived checkpoint {checkpoint}"
    assert rep["verify_ok"], rep
    # all 5 docs recovered in every scenario (pending ones via WAL replay)
    assert rep["frame_count"] == 5, rep
    assert rep["generation"] in SCENARIOS[checkpoint]["expect_gen"], rep


@pytest.mark.parametrize("checkpoint", list(SCENARIOS))
def test_crash_recovery_after_wal_wrap(checkpoint, tmp_path):
    """The wrap x checkpoint matrix: every crash seam also holds when the pending
    batch has wrapped a tiny WAL ring (post-wrap geometry at recovery time)."""
    rep = run_scenario(checkpoint, tmp_path, committed=90, pending=30, wrap=True)
    assert rep["child_killed"], f"child survived checkpoint {checkpoint}"
    assert rep["verify_ok"], rep
    assert rep["frame_count"] == 120, rep
    assert rep["generation"] in SCENARIOS[checkpoint]["expect_gen"], rep
