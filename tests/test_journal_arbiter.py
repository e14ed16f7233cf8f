"""Durable arbiter record table (r12, VERDICT r11 ask #2).

JournalledCommitArbiter write-ahead-journals every acknowledged mutation
to an fsync'd append-only file and replays it on construction, so an
arbiter restart comes back knowing every committed name and every
pending finalize — restart amnesia becomes IMPOSSIBLE rather than
reconciled. These tests pin:

- replay round-trip (all five mutation ops),
- the torn-tail rule (one torn FINAL line tolerated; corruption with
  entries after it is loud),
- crash-between-CAS-and-finalize surviving the restart as a pending
  record the reader self-heal finishes (the window the in-memory
  arbiter could only resolve via writer-side reconciliation),
- stale-basis CAS rejection across a restart WITHOUT any re-seed (the
  foreign-different-name window from ADVICE r11 closes at the CAS),
- startup compaction preserving the record table.

Cross-process twin: examples/arbiter_restart_probe.py --durable runs
the real SIGKILL + warm-standby takeover with zero outage retries.
"""

from __future__ import annotations

import json
import uuid

import pytest

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (
    ArbiterLogStore,
    ConcurrentCommitError,
    JournalledCommitArbiter,
)


def _mutate(arb: JournalledCommitArbiter) -> None:
    arb.record("t1", "v000000000", None)
    arb.seed("t1", ["v000000000", "vseeded"])  # v0 not re-journalled
    arb.cas("t1", ("v000000000", "vseeded"), "v000000001", ".staged.x.json")
    arb.mark_complete("t1", "v000000001")
    arb.cas(
        "t1",
        ("v000000000", "v000000001", "vseeded"),
        "v000000002",
        ".staged.y.json",
    )  # left PENDING
    arb.record("t2", "gone", None)
    arb.forget("t2", "gone")


def test_journal_replay_round_trip(tmp_path):
    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(jp)
    assert a.replayed_entries == 0
    _mutate(a)
    want_t1 = a.records("t1")
    assert want_t1["v000000002"] == ".staged.y.json"  # pending survives
    a.close()

    b = JournalledCommitArbiter(jp)
    assert b.replayed_entries > 0
    assert b.records("t1") == want_t1
    assert b.records("t2") == {}  # forget replayed
    # durable CAS continues from the replayed state with no seeding
    b.cas(
        "t1",
        ("v000000000", "v000000001", "v000000002", "vseeded"),
        "v000000003",
        ".staged.z.json",
    )
    assert b.records("t1")["v000000003"] == ".staged.z.json"
    b.close()


def test_torn_final_line_tolerated_mid_corruption_loud(tmp_path):
    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(jp)
    a.record("t", "v000000000", None)
    a.record("t", "v000000001", None)
    a.close()
    # crash mid-append: torn, newline-less tail
    with open(jp, "ab") as fh:
        fh.write(b'{"op": "record", "table": "t", "na')
    b = JournalledCommitArbiter(jp)
    assert b.replayed_entries == 2
    assert set(b.records("t")) == {"v000000000", "v000000001"}
    b.close()
    # corruption with intact entries AFTER it is NOT a torn tail
    lines = open(jp, "rb").read().splitlines()
    lines[0] = b"garbage"
    open(jp, "wb").write(b"\n".join(lines) + b"\n")
    with pytest.raises(ValueError, match="corrupt at line 1"):
        JournalledCommitArbiter(jp)


def test_restart_during_cas_window_self_heals(spark, tmp_path):
    """A CAS-won commit whose finalize never ran survives the restart as
    a PENDING record; the first reader after the restart finishes the
    finalize from the staged file — no writer-side ambiguity
    reconciliation involved (the in-memory arbiter lost this record and
    needed the reconciliation protocol instead)."""
    jp = str(tmp_path / "arbiter.journal")
    mdir = str(tmp_path / "state" / "manifests")
    a = JournalledCommitArbiter(jp)
    store = ArbiterLogStore(a)
    store.commit(spark, mdir, "v000000000", {"batch_id": 0}, expected=None)
    basis = tuple(store.list_commits(spark, mdir))

    # simulate the crash window by hand: stage + CAS, no finalize
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.sources.maintenance import (
        _fs_and_path,
    )

    fs, _, jvm = _fs_and_path(spark, mdir)
    staged_name = f".staged.v000000001.{uuid.uuid4().hex}.json"
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{mdir}/{staged_name}"), True)
    try:
        out.write(bytearray(json.dumps({"batch_id": 1}).encode("utf-8")))
    finally:
        out.close()
    table = store._table_key(spark, mdir)
    a.cas(table, basis, "v000000001", staged_name)
    a.close()  # SIGKILL here

    b = JournalledCommitArbiter(jp)
    reader = ArbiterLogStore(b)
    assert reader.list_commits(spark, mdir) == ["v000000000", "v000000001"]
    assert reader.read_commit(spark, mdir, "v000000001")["batch_id"] == 1
    assert b.records(table)["v000000001"] is None  # finalize completed
    b.close()


def test_stale_basis_rejected_at_cas_across_restart(spark, tmp_path):
    """ADVICE r11's residual window: with the in-memory arbiter, a
    foreign commit under a DIFFERENT name + a restart + the stale
    writer's own-basis re-seed let a stale CAS pass. The durable table
    replays the foreign name, so the CAS itself rejects — and a CORRECT
    basis passes with no seeding at all."""
    jp = str(tmp_path / "arbiter.journal")
    mdir = str(tmp_path / "state" / "manifests")
    a = JournalledCommitArbiter(jp)
    store = ArbiterLogStore(a)
    store.commit(spark, mdir, "v000000000", {"batch_id": 0}, expected=None)
    stale = tuple(store.list_commits(spark, mdir))
    store.commit(
        spark, mdir, "v000000001", {"batch_id": 1, "who": "f"}, expected=stale
    )
    table = store._table_key(spark, mdir)
    a.close()

    b = JournalledCommitArbiter(jp)
    # the stale-basis CAS is rejected BY THE ARBITER (no re-seed ran)
    with pytest.raises(ConcurrentCommitError, match="basis advanced"):
        b.cas(table, stale, "v000000002", ".staged.w.json")
    # the correct basis passes without seeding
    b.cas(table, ("v000000000", "v000000001"), "v000000002", ".staged.w.json")
    assert b.records(table)["v000000002"] == ".staged.w.json"
    b.close()


def test_compact_on_start_preserves_records(tmp_path):
    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(jp)
    _mutate(a)
    want = {t: a.records(t) for t in ("t1", "t2")}
    a.close()
    import os

    size_before = os.path.getsize(jp)
    b = JournalledCommitArbiter(jp, compact_on_start=True)
    assert {t: b.records(t) for t in ("t1", "t2")} == want
    assert os.path.getsize(jp) <= size_before
    b.close()
    # and the compacted journal replays identically
    c = JournalledCommitArbiter(jp)
    assert {t: c.records(t) for t in ("t1", "t2")} == want
    c.close()

def test_journal_write_failure_poisons_the_arbiter(tmp_path):
    """r12 review (protocol bug #7, caught before commit): a failed
    journal write/fsync leaves durability UNKNOWN — continuing to serve
    would let the live table and the journal diverge inside one
    incarnation. The failing call must raise the AMBIGUOUS-outcome
    error (writers reconcile), every later mutation must refuse until
    restart, reads stay allowed, and a restart replays exactly the
    durable tail."""
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (
        ArbiterUnavailableError,
    )

    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(jp)
    a.record("t", "v000000000", None)

    class _BrokenFh:
        def write(self, b):
            raise OSError(28, "No space left on device")

        def flush(self):
            pass

        def fileno(self):
            return 0

        def close(self):
            pass

    a._fh = _BrokenFh()
    with pytest.raises(ArbiterUnavailableError, match="durability is unknown"):
        a.cas("t", ("v000000000",), "v000000001", ".staged.x.json")
    # live state NOT mutated (journal-before-apply)
    assert a.records("t") == {"v000000000": None}
    # poisoned: every further mutation refuses, reads still serve
    with pytest.raises(ArbiterUnavailableError, match="poisoned"):
        a.record("t", "v000000002", None)
    with pytest.raises(ArbiterUnavailableError, match="poisoned"):
        a.forget("t", "v000000000")
    # a TRUE no-op (already-complete mark) never needed the journal and
    # truthfully changes nothing — it stays allowed even when poisoned
    a.mark_complete("t", "v000000000")
    assert a.records("t") == {"v000000000": None}
    a.close()

    # restart: the durable tail is the single truth
    b = JournalledCommitArbiter(jp)
    assert b.records("t") == {"v000000000": None}
    b.cas("t", ("v000000000",), "v000000001", ".staged.x.json")  # healthy again
    assert b.records("t")["v000000001"] == ".staged.x.json"
    b.close()

def test_auto_compaction_triggers_and_preserves_state(tmp_path):
    """r13 (VERDICT r12 ask #3): a long-lived arbiter must bound its WAL
    without a restart. With churn traffic (record → mark_complete →
    forget) the live table stays tiny while the journal grows 3 lines
    per cycle — the size trigger must fire, the rewritten journal must
    replay to the identical table, and post-compaction appends must land
    in the FRESH file (the handle swap is the dangerous part)."""
    import os

    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(
        jp, auto_compact_factor=2.0, auto_compact_min_bytes=2048
    )
    a.record("t", "vkeep", None)  # one permanent record
    for i in range(200):
        name = f"v{i:09d}"
        a.record("t", name, ".staged.x.json")
        a.mark_complete("t", name)
        a.forget("t", name)
    assert a.compactions >= 1
    # bounded: snapshot of the 1-record table is ~70 bytes, so the
    # journal can never exceed min_bytes + one compaction cycle of slack
    assert os.path.getsize(jp) < 3 * 2048
    want = a.records("t")
    assert want == {"vkeep": None}
    # appends after the handle swap are durable in the NEW file
    a.cas("t", ("vkeep",), "vafter", ".staged.y.json")
    want = a.records("t")
    a.close()
    b = JournalledCommitArbiter(jp)
    assert b.records("t") == want
    assert b.records("t")["vafter"] == ".staged.y.json"
    b.close()


def test_auto_compaction_rebases_threshold_on_growing_table(tmp_path):
    """A genuinely-growing record table must not thrash the compactor:
    each rewrite re-bases the factor on the fresh snapshot size, so N
    permanent records cost O(log N) compactions, not O(N)."""
    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(
        jp, auto_compact_factor=2.0, auto_compact_min_bytes=512
    )
    for i in range(300):
        a.record("t", f"v{i:09d}", None)
    assert 1 <= a.compactions <= 12  # ~log2(300·line/512) rewrites
    want = a.records("t")
    assert len(want) == 300
    a.close()
    b = JournalledCommitArbiter(jp)
    assert b.records("t") == want
    b.close()


def test_compact_method_forces_rewrite(tmp_path):
    import os

    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(jp, auto_compact_factor=None)
    _mutate(a)
    size_before = os.path.getsize(jp)
    a.compact()
    assert a.compactions == 1
    assert os.path.getsize(jp) < size_before
    want = {t: a.records(t) for t in ("t1", "t2")}
    # still serving on the fresh handle
    a.record("t1", "vpost", None)
    a.close()
    b = JournalledCommitArbiter(jp)
    assert b.records("t1")["vpost"] is None
    assert {t: {k: v for k, v in b.records(t).items() if k != "vpost"}
            for t in ("t1", "t2")} == want
    b.close()


def test_auto_compaction_snapshot_failure_disables_not_poisons(tmp_path):
    """A failed tmp-snapshot write leaves the REAL journal untouched —
    no durability ambiguity, so the arbiter keeps serving with
    auto-compaction disabled (vs the reopen-after-rename failure, which
    must poison because the old fd names an unlinked inode)."""
    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(
        jp, auto_compact_factor=1.0, auto_compact_min_bytes=64
    )

    def boom():
        raise OSError(28, "No space left on device")

    a._write_snapshot_and_replace = boom
    for i in range(20):
        a.record("t", f"v{i:09d}", None)
    assert a._auto_compact_factor is None  # disabled, not poisoned
    assert a._poisoned is None
    want = a.records("t")
    assert len(want) == 20
    a.close()
    b = JournalledCommitArbiter(jp)
    assert b.records("t") == want
    b.close()


def test_auto_compaction_reopen_failure_poisons(tmp_path):
    """After os.replace the pre-compaction handle names an unlinked
    inode; if the fresh open fails, appends would silently vanish — the
    arbiter must fail-stop exactly like a failed fsync."""
    import builtins

    from unittest import mock

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (
        ArbiterUnavailableError,
    )

    jp = str(tmp_path / "arbiter.journal")
    a = JournalledCommitArbiter(
        jp, auto_compact_factor=1.0, auto_compact_min_bytes=64
    )
    a.record("t", "v000000000", None)

    real_open = builtins.open

    def deny_append(path, mode="r", *args, **kwargs):
        if path == jp and mode == "ab":
            raise OSError(24, "Too many open files")
        return real_open(path, mode, *args, **kwargs)

    with mock.patch("builtins.open", side_effect=deny_append):
        with pytest.raises(ArbiterUnavailableError, match="reopen after compaction"):
            for i in range(50):  # enough appends to cross the trigger
                a.record("t", f"vx{i:08d}", None)
    with pytest.raises(ArbiterUnavailableError, match="poisoned"):
        a.record("t", "vafter", None)
    # the journal's durable tail is still the single truth
    want_names = set(a.records("t"))
    a.close()
    b = JournalledCommitArbiter(jp)
    assert set(b.records("t")) == want_names
    b.close()


@pytest.mark.parametrize(
    "arbiter_kwargs",
    [
        {},  # default: auto-compaction at 4× / 1 MiB (never fires at 40 ops)
        # r13: the SAME invariant must hold with the auto-compactor
        # rewriting the journal mid-sequence — thresholds tiny enough
        # that a 40-op run crosses the trigger many times
        {"auto_compact_factor": 1.0, "auto_compact_min_bytes": 96},
    ],
    ids=["plain", "auto-compacting"],
)
def test_journal_replay_equals_live_state_property(arbiter_kwargs):
    """Property: for ANY sequence of valid mutations, a fresh replay of
    the journal reconstructs the live record table bit-for-bit — the
    single invariant everything else (CAS rejection, self-heal,
    zero-reconciliation restart) rests on. CAS entries are generated
    against the live table's own current basis so they always apply.
    Parametrized over the r13 auto-compactor: a journal rewritten in
    place mid-sequence must stay replay-equivalent."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    op_st = st.tuples(
        st.sampled_from(["record", "seed", "cas", "mark_complete", "forget"]),
        st.sampled_from(["t1", "t2"]),
        st.sampled_from(["va", "vb", "vc", "vd", "ve"]),
        st.sampled_from([None, ".staged.1.json", ".staged.2.json"]),
    )

    @given(st.lists(op_st, max_size=40))
    @settings(max_examples=30, deadline=None)
    def run(ops):
        with tempfile.TemporaryDirectory() as d:
            jp = f"{d}/arbiter.journal"
            live = JournalledCommitArbiter(jp, **arbiter_kwargs)
            for op, table, name, staged in ops:
                if op == "record":
                    live.record(table, name, staged)
                elif op == "seed":
                    live.seed(table, [name])
                elif op == "cas":
                    basis = tuple(sorted(live.records(table)))
                    live.cas(table, basis, name, staged or ".staged.x.json")
                elif op == "mark_complete":
                    live.mark_complete(table, name)
                else:
                    live.forget(table, name)
            want = {t: live.records(t) for t in ("t1", "t2")}
            live.close()
            replayed = JournalledCommitArbiter(jp)
            assert {t: replayed.records(t) for t in ("t1", "t2")} == want
            replayed.close()

    run()
