"""Object-store-safe commit protocol: two interleaved
``update_snapshot`` writers must serialize through the conditional-put
marker commit — exactly one wins each version number, the loser
retries against the winner's output, readers never see a torn state,
and the commit path never relies on an atomic rename (the primitive
object stores don't have).

Parity context: the reference delegates this to database transactions
(``R/DiseasystoreBase.R:145-156`` takes a DB lock around compute);
at the 100 TB target the feature store lives on object storage where
directory rename is non-atomic and flock does not exist, so the
version commit is a PUT-IF-ABSENT of an immutable marker instead
(see ``storage/scd2.py`` module docstring).
"""

from __future__ import annotations

import datetime
import inspect
import os
import time

import pytest

from diseasystore_spark.storage.backends import MemoryCommitBackend
from diseasystore_spark.storage.scd2 import (
    CommitConflictError,
    ParquetFeatureStore,
)

T = datetime.datetime


@pytest.fixture(params=["local", "memory"])
def mkstore(request, spark, store_root):
    """Construct stores over BOTH commit backends: the POSIX one
    (os.link conditional put) and the in-memory object-store double
    (compare-and-set, no links, no renames). Every test in this suite
    runs twice — green over the double proves the commit protocol
    needs nothing an object store lacks. Stores built by one test
    share one memory-backend instance (clients of one bucket)."""

    def make(**kw):
        if request.param == "memory":
            kw.setdefault(
                "commit_backend", MemoryCommitBackend.shared(store_root)
            )
        return ParquetFeatureStore(spark, store_root, **kw)

    return make


def _df(spark, rows):
    return spark.createDataFrame(rows, "key_id string, v double")


def _snap(be, ts):
    return {(r["key_id"], r["v"]) for r in be.get_table("ds.t", ts).collect()}


def test_interleaved_writers_one_loser_then_serial_result(
    spark, store_root, monkeypatch, mkstore
):
    """Writer A builds its merge against version N; before A's commit
    lands, writer B commits N+1 (injected inside A's first conditional
    put, i.e. the worst-case interleaving: A's data directory is fully
    written from stale state). A must LOSE the put for N+1, clean up
    its orphan directory, and the automatic retry must re-merge A's
    snapshot on top of B's — yielding exactly the serial A-after-B
    result. A reader polling between steps only ever sees complete
    committed snapshots."""
    a = mkstore()
    b = mkstore()
    reader = mkstore()

    t1, t2, t3 = T(2024, 1, 1), T(2024, 1, 2), T(2024, 1, 3)
    a.update_snapshot(_df(spark, [("a", 1.0)]), "ds.t", t1)  # v1

    observed = []  # reader states captured mid-race
    state = {"fired": False, "losses": 0}
    real_put = ParquetFeatureStore._put_if_absent

    def racing_put(self, path, data):
        # Fire B's full update exactly once, just before A's first
        # marker put — after A has already written its data directory.
        if self is a and not state["fired"] and path.endswith("2.json"):
            state["fired"] = True
            b.update_snapshot(_df(spark, [("a", 5.0)]), "ds.t", t2)  # wins v2
            observed.append(_snap(reader, t2))  # mid-race read
        ok = real_put(self, path, data)
        if not ok:
            state["losses"] += 1
        return ok

    monkeypatch.setattr(ParquetFeatureStore, "_put_if_absent", racing_put)
    # A's snapshot at t3: 'a' reverts to 1.0 and 'b' appears.
    a.update_snapshot(_df(spark, [("a", 1.0), ("b", 2.0)]), "ds.t", t3)

    assert state["fired"], "interleaving did not trigger"
    assert state["losses"] >= 1, "A never lost a conditional put"
    # mid-race reader saw B's complete snapshot, not a torn state
    assert observed == [{("a", 5.0)}]

    # final history == serial execution: v1 by A, v2 by B, v3 by A's retry
    assert a._current_version("ds.t") == 3
    assert _snap(reader, t1) == {("a", 1.0)}
    assert _snap(reader, t2) == {("a", 5.0)}
    assert _snap(reader, t3) == {("a", 1.0), ("b", 2.0)}

    # the loser's orphan data directory was cleaned up: every _v dir
    # on disk is referenced by a surviving commit marker
    tdir = os.path.join(store_root, "ds", "t")
    marker_dirs = {
        a._version_dir("ds.t", v)
        for v in (2, 3)  # keep-2 GC retains current + previous
    }
    on_disk = {
        os.path.join(tdir, e)
        for e in os.listdir(tdir)
        if e.startswith("_v")
    }
    assert on_disk == marker_dirs


def test_commit_path_never_calls_rename(
    spark, store_root, monkeypatch, mkstore
):
    """The version COMMIT must not depend on atomic rename (object
    stores don't have one). Any ``os.replace``/``os.rename`` issued
    from ``storage/scd2.py`` during a full write→commit cycle fails
    the test; Spark's own parquet task commit (JVM-side) is out of
    scope — on a real cluster that is the job committer's contract."""
    calls = []
    real_replace, real_rename = os.replace, os.rename

    def spy(real):
        def inner(*args, **kwargs):
            caller = inspect.stack()[1].filename
            if caller.endswith(os.sep + "scd2.py") or caller.endswith(
                os.sep + "backends.py"
            ):
                calls.append((real.__name__, args))
            return real(*args, **kwargs)

        return inner

    monkeypatch.setattr(os, "replace", spy(real_replace))
    monkeypatch.setattr(os, "rename", spy(real_rename))

    be = mkstore()
    be.update_snapshot(_df(spark, [("a", 1.0)]), "ds.t", T(2024, 1, 1))
    be.update_snapshot(_df(spark, [("a", 2.0)]), "ds.t", T(2024, 1, 2))
    be.compact("ds.t")
    assert calls == []
    assert _snap(be, T(2024, 1, 2)) == {("a", 2.0)}


def test_persistent_loser_raises_after_bounded_retries(
    spark, store_root, monkeypatch, mkstore
):
    """A writer that loses every conditional put (e.g. a livelocked
    fan-in) surfaces CommitConflictError after _COMMIT_RETRIES
    attempts instead of looping forever."""
    be = mkstore()
    be.update_snapshot(_df(spark, [("a", 1.0)]), "ds.t", T(2024, 1, 1))

    monkeypatch.setattr(
        ParquetFeatureStore, "_put_if_absent", lambda self, p, d: False
    )
    attempts = {"n": 0}
    real_attempt = ParquetFeatureStore._update_snapshot_attempt

    def counting(self, *args, **kwargs):
        attempts["n"] += 1
        return real_attempt(self, *args, **kwargs)

    monkeypatch.setattr(
        ParquetFeatureStore, "_update_snapshot_attempt", counting
    )
    with pytest.raises(CommitConflictError):
        be.update_snapshot(_df(spark, [("a", 2.0)]), "ds.t", T(2024, 1, 2))
    assert attempts["n"] == ParquetFeatureStore._COMMIT_RETRIES


def test_legacy_pointer_layout_still_readable(spark, store_root, mkstore):
    """Tables written by the old ``_CURRENT`` + ``_v{N}`` layout read
    transparently (fallbacks in _current_version/_version_dir); the
    first new-protocol write moves them onto the marker log."""
    be = mkstore()
    # hand-build a legacy table
    tdir = os.path.join(store_root, "ds", "t")
    os.makedirs(tdir, exist_ok=True)
    df = _df(spark, [("a", 1.0)]).selectExpr(
        "key_id",
        "v",
        "sha2(concat_ws('\x1f', key_id, cast(v as string)), 256) AS checksum",
        "timestamp'2024-01-01' AS from_ts",
        "cast(NULL as timestamp) AS until_ts",
    )
    df.write.parquet(os.path.join(tdir, "_v1"))
    with open(os.path.join(tdir, "_CURRENT"), "w") as fh:
        fh.write("1")

    assert be._current_version("ds.t") == 1
    assert be.table_exists("ds.t")
    assert _snap(be, T(2024, 1, 5)) == {("a", 1.0)}

    be.update_snapshot(_df(spark, [("a", 2.0)]), "ds.t", T(2024, 1, 6))
    assert be._current_version("ds.t") == 2
    assert be._read_marker("ds.t", 2) is not None
    assert _snap(be, T(2024, 1, 5)) == {("a", 1.0)}
    assert _snap(be, T(2024, 1, 6)) == {("a", 2.0)}


def test_vanished_base_manifest_surfaces_as_retryable_conflict(
    spark, store_root, monkeypatch, mkstore
):
    """Scoped manifest write: if the base version's marker has been
    GC'd by the time the writer builds its carry-forward manifest
    (concurrent writers advanced the table 2+ commits — keep-2
    dropped the base), the writer must surface the retryable
    CommitConflictError (the retry re-reads the advanced table),
    never a torn commit referencing dead files, and must clean its
    orphan segment. (The old vanished-DIRECTORY failure mode is gone
    by construction: unchanged months are referenced, not linked, and
    a winning conditional put proves its references outlived GC — GC
    deleting version N's files requires a commit of N+2+, which would
    have made the put for N+1 lose.)"""
    import datetime

    be = mkstore(partition_granularity="month")

    def _pdf(rows):
        return spark.createDataFrame(
            rows, "key_id string, v double, valid_from date, valid_until date"
        )

    D = datetime.date
    rows = [("a", 1.0, D(2020, 1, 10), D(2020, 1, 20)),
            ("b", 2.0, D(2020, 2, 10), D(2020, 2, 20))]
    be.update_snapshot(_pdf(rows), "ds.t", T(2024, 1, 1))

    real_manifest_of = ParquetFeatureStore._manifest_of
    state = {"calls": 0}

    def vanishing(self, table_id, version):
        # reads and the _scoped_write_ok gate see the marker fine;
        # only _write_version's carry-forward read finds it GC'd
        if any(
            fr.function == "_write_version" for fr in inspect.stack()[1:6]
        ):
            state["calls"] += 1
            return None
        return real_manifest_of(self, table_id, version)

    monkeypatch.setattr(ParquetFeatureStore, "_manifest_of", vanishing)
    rows2 = [("a", 9.0, D(2020, 1, 10), D(2020, 1, 20)),
             ("b", 2.0, D(2020, 2, 10), D(2020, 2, 20))]
    with pytest.raises(CommitConflictError):
        be._update_snapshot_attempt(
            _pdf(rows2), "ds.t", T(2024, 1, 2),
            written_range=(D(2020, 1, 1), D(2020, 1, 31)),
        )
    assert state["calls"] >= 1, "carry-forward read never happened"
    # no orphan _v2 attempt segments left behind
    tdir = os.path.join(store_root, "ds", "t")
    orphans = [e for e in os.listdir(tdir) if e.startswith("_v2")]
    assert orphans == []


def test_plan_time_base_version_pins_the_commit(
    spark, store_root, monkeypatch, mkstore
):
    """Lost-update window between plan and commit (the readVersion
    contract): writer A resolves its base version N when it builds the
    merge plan; a competitor B then commits N+1 while A is still
    writing (injected at A's _write_version entry — after A's plan is
    derived, before A's data lands). A must claim N+1 — pinned to the
    base its plan was DERIVED from, not a re-resolved current version
    — so the conditional put fails and the retry re-merges on top of
    B. Claiming a re-resolved N+2 would succeed unopposed and silently
    erase B's rows from every subsequent version."""
    a = mkstore()
    b = mkstore()

    t1, t2, t3 = T(2024, 1, 1), T(2024, 1, 2), T(2024, 1, 3)
    a.update_snapshot(_df(spark, [("a", 1.0)]), "ds.t", t1)  # v1

    state = {"fired": False, "losses": 0}
    real_write = ParquetFeatureStore._write_version
    real_put = ParquetFeatureStore._put_if_absent

    def racing_write(self, new_table, table_id, changed_months, **kw):
        # A's merge plan (derived from base=v1) is already built when
        # this runs; B sneaks in a full commit for v2 first.
        if self is a and not state["fired"]:
            state["fired"] = True
            b.update_snapshot(_df(spark, [("a", 5.0)]), "ds.t", t2)  # wins v2
        return real_write(self, new_table, table_id, changed_months, **kw)

    def counting_put(self, path, data):
        ok = real_put(self, path, data)
        if self is a and not ok:
            state["losses"] += 1
        return ok

    monkeypatch.setattr(ParquetFeatureStore, "_write_version", racing_write)
    monkeypatch.setattr(ParquetFeatureStore, "_put_if_absent", counting_put)
    a.update_snapshot(_df(spark, [("a", 1.0), ("b", 2.0)]), "ds.t", t3)

    assert state["fired"], "interleaving did not trigger"
    # the pinned base made A contend for v2 and LOSE (the unfixed code
    # claims v3 unopposed here: zero losses and B's row erased)
    assert state["losses"] >= 1, "A never contended for B's version"
    assert a._current_version("ds.t") == 3
    # B's interval survives A's rewrite — the serial A-after-B history
    assert _snap(a, t1) == {("a", 1.0)}
    assert _snap(a, t2) == {("a", 5.0)}
    assert _snap(a, t3) == {("a", 1.0), ("b", 2.0)}


def test_gc_spares_young_inflight_attempt_dirs(spark, store_root, mkstore):
    """Commit-time GC must never sweep another writer's uncommitted
    in-flight attempt directory (tokenized name, no marker): those are
    removed only once older than _ORPHAN_RETENTION_SECS. Committed,
    superseded versions are still collected promptly via their
    markers."""
    be = mkstore()
    be.update_snapshot(_df(spark, [("a", 1.0)]), "ds.t", T(2024, 1, 1))

    # a concurrent writer's in-flight attempt for version 2 — data
    # partially written, marker not yet put, mtime = now
    tdir = os.path.join(store_root, "ds", "t")
    inflight = os.path.join(tdir, "_v2-aaaaaaaa")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as fh:
        fh.write(b"partial")

    be.update_snapshot(_df(spark, [("a", 2.0)]), "ds.t", T(2024, 1, 2))  # v2
    be.update_snapshot(_df(spark, [("a", 3.0)]), "ds.t", T(2024, 1, 3))  # v3
    # v3's GC sweeps versions < 2: the COMMITTED v1 dir goes, the
    # young uncommitted v2 attempt stays
    assert os.path.isdir(inflight), "GC swept a live writer's attempt dir"
    assert not os.path.isdir(be._version_dir("ds.t", 1))

    # once clearly abandoned (older than the retention window) it is
    # swept by the next commit
    old = time.time() - ParquetFeatureStore._ORPHAN_RETENTION_SECS - 60
    os.utime(inflight, (old, old))
    be.update_snapshot(_df(spark, [("a", 4.0)]), "ds.t", T(2024, 1, 4))  # v4
    assert not os.path.isdir(inflight)
    assert _snap(be, T(2024, 1, 4)) == {("a", 4.0)}


def test_compact_loses_race_to_merge_then_retries_cleanly(
    spark, store_root, monkeypatch, mkstore
):
    """compact() is a writer too: its physical re-layout must go
    through the same conditional-put loop. Inject a full
    update_snapshot (new row, new slice_ts) inside compact's first
    marker put — compact must LOSE, clean up, and its retry must
    re-plan against the merged table, so the racing merge's row
    survives the compaction and every earlier snapshot is
    bit-identical. Afterwards the store is converged: one more
    compact() is a version-bump-free no-op."""
    a = mkstore(partition_granularity="month")
    b = mkstore(partition_granularity="month")

    D = datetime.date

    def dfp(rows):
        return spark.createDataFrame(
            rows, "key_id string, v double, valid_from date, valid_until date"
        )

    t1, t3 = T(2024, 1, 1), T(2024, 1, 3)
    jan = D(2020, 1, 10), D(2020, 1, 20)
    base_rows = [(f"a{i}", float(i), *jan) for i in range(35)]
    a.update_snapshot(dfp(base_rows), "ds.t", t1)  # v1: one 35-row file
    # knob set AFTER the write: the retroactive size cap makes the
    # single 35-row January file fragmentation compact() must fix
    a.max_records_per_file = 10
    v_before = a._current_version("ds.t")

    state = {"fired": False, "losses": 0}
    real_put = ParquetFeatureStore._put_if_absent

    def racing_put(self, path, data):
        if self is a and not state["fired"]:
            state["fired"] = True
            # merge wins the version compact was about to claim
            b.update_snapshot(
                dfp(base_rows + [("c", 99.0, D(2020, 2, 5), None)]),
                "ds.t",
                t3,
            )
        ok = real_put(self, path, data)
        if not ok:
            state["losses"] += 1
        return ok

    monkeypatch.setattr(ParquetFeatureStore, "_put_if_absent", racing_put)
    a.compact("ds.t")
    monkeypatch.setattr(ParquetFeatureStore, "_put_if_absent", real_put)

    assert state["fired"] and state["losses"] >= 1, state
    want_base = {(k, v) for (k, v, *_r) in base_rows}
    # the racing merge's row survived the compaction rewrite
    snap = {
        (r["key_id"], r["v"])
        for r in a.get_table("ds.t", t3).collect()
    }
    assert snap == want_base | {("c", 99.0)}
    # the earlier snapshot is bit-identical
    assert {
        (r["key_id"], r["v"]) for r in a.get_table("ds.t", t1).collect()
    } == want_base
    # converged: compact is now a no-op (no version churn), and the
    # race cost exactly two commits beyond the setup (merge + compact)
    v_after = a._current_version("ds.t")
    assert v_after == v_before + 2
    assert a.compact("ds.t") > 0
    assert a._current_version("ds.t") == v_after
