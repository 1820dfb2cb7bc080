"""Month-partitioned SCD2 layout: same merge semantics, pruned
rewrites, unchanged partitions carried forward by MANIFEST REFERENCE
(no links, no copies — a commit costs O(changed months))."""

from __future__ import annotations

import datetime
import os

import pytest

from diseasystore_spark.storage.scd2 import PARTITION_COL, ParquetFeatureStore

T = datetime.datetime
D = datetime.date


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key_id string, v double, valid_from date, valid_until date"
    )


@pytest.fixture(params=["local", "memory"])
def pstore(request, spark, tmp_path):
    """The whole partitioned-manifest suite (reference carry, scoped
    merges, file-level GC, partial compaction) runs over BOTH commit
    backends — green over the in-memory object-store double proves
    the manifest lifecycle needs no filesystem primitive."""
    from diseasystore_spark.storage.backends import MemoryCommitBackend

    root = str(tmp_path / "pstore")
    kw = {}
    if request.param == "memory":
        kw["commit_backend"] = MemoryCommitBackend.shared(root)
    return ParquetFeatureStore(
        spark, root, partition_granularity="month", **kw
    )


ROWS_V1 = [
    ("a", 1.0, D(2020, 1, 10), D(2020, 1, 20)),
    ("b", 2.0, D(2020, 2, 10), D(2020, 2, 20)),
    ("c", 3.0, D(2020, 3, 10), None),
]


def test_partitioned_layout_and_semantics(spark, pstore):
    t1, t2 = T(2024, 1, 1), T(2024, 1, 2)
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)
    m1 = pstore._manifest_of("ds.t", 1)["months"]
    assert sorted(m1) == ["2020-01", "2020-02", "2020-03"]
    tdir = pstore._version_dir("ds.t", 1)
    parts = sorted(e for e in os.listdir(tdir) if e.startswith(PARTITION_COL))
    assert parts == [
        f"{PARTITION_COL}=2020-01",
        f"{PARTITION_COL}=2020-02",
        f"{PARTITION_COL}=2020-03",
    ]
    snap = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t1).collect()}
    assert snap == {"a": 1.0, "b": 2.0, "c": 3.0}

    # change only the February row -> only 2020-02 is rewritten
    rows_v2 = [
        ("a", 1.0, D(2020, 1, 10), D(2020, 1, 20)),
        ("b", 9.0, D(2020, 2, 10), D(2020, 2, 20)),
        ("c", 3.0, D(2020, 3, 10), None),
    ]
    pstore.update_snapshot(_df(spark, rows_v2), "ds.t", t2)
    m2 = pstore._manifest_of("ds.t", 2)["months"]

    # January and March are carried forward by REFERENCE: the v2
    # manifest repeats v1's exact file entries (which live in v1's
    # segment directory — no link, no copy, no I/O)
    assert m2["2020-01"] == m1["2020-01"]
    assert m2["2020-03"] == m1["2020-03"]
    v1_dirname = pstore._manifest_of("ds.t", 1)["dir"]
    assert all(f.startswith(v1_dirname + "/") for f in m2["2020-01"])
    # February was rewritten into v2's own segment
    assert set(m2["2020-02"]).isdisjoint(m1["2020-02"])
    v2_dirname = pstore._manifest_of("ds.t", 2)["dir"]
    assert all(f.startswith(v2_dirname + "/") for f in m2["2020-02"])

    snap2 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t2).collect()}
    assert snap2 == {"a": 1.0, "b": 9.0, "c": 3.0}
    snap1 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t1).collect()}
    assert snap1 == {"a": 1.0, "b": 2.0, "c": 3.0}


def test_noop_merge_skips_version(spark, pstore):
    t1 = T(2024, 1, 1)
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)
    assert pstore._current_version("ds.t") == 1
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)
    assert pstore._current_version("ds.t") == 1  # nothing changed


def test_partition_pruned_snapshot_read(spark, pstore):
    t1 = T(2024, 1, 1)
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)
    pruned = pstore.get_table("ds.t", t1, max_valid_from=D(2020, 2, 28))
    assert {r["key_id"] for r in pruned.collect()} == {"a", "b"}
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "2020-03" not in plan or "PartitionFilters" in plan


def test_partitioned_survives_gc(spark, pstore):
    """Manifest references keep shared files alive when old versions
    are GC'd (file-level GC deletes only unreferenced files)."""
    ts = [T(2024, 1, i + 1) for i in range(4)]
    rows = ROWS_V1
    pstore.update_snapshot(_df(spark, rows), "ds.t", ts[0])
    for i, newv in enumerate([4.0, 5.0, 6.0]):
        rows = [("a", newv, D(2020, 1, 10), D(2020, 1, 20))] + rows[1:]
        pstore.update_snapshot(_df(spark, rows), "ds.t", ts[i + 1])
    # v1, v2 GC'd; current still reads all three keys at the last slice
    snap = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", ts[3]).collect()}
    assert snap == {"a": 6.0, "b": 2.0, "c": 3.0}


def test_file_level_gc_keeps_shared_files_deletes_dead_ones(spark, pstore):
    """The GC unit is the FILE, not the version directory: when v1's
    marker falls out of keep-2, v1's rewritten-month files die but its
    never-rewritten months' files — still referenced by the current
    manifest — must survive in place. (A directory-granularity GC
    would corrupt every carried-forward reference.)"""
    ts = [T(2024, 1, i + 1) for i in range(4)]
    rows = ROWS_V1
    pstore.update_snapshot(_df(spark, rows), "ds.t", ts[0])  # v1
    m1 = pstore._manifest_of("ds.t", 1)["months"]
    tdir = pstore._table_dir("ds.t")
    jan_v1 = [os.path.join(tdir, f) for f in m1["2020-01"]]
    mar_v1 = [os.path.join(tdir, f) for f in m1["2020-03"]]

    # revise January three times; March is never touched again
    for i, newv in enumerate([4.0, 5.0, 6.0]):
        rows = [("a", newv, D(2020, 1, 10), D(2020, 1, 20))] + rows[1:]
        pstore.update_snapshot(_df(spark, rows), "ds.t", ts[i + 1])

    # keep-2 dropped v1 and v2: v1's January files are unreferenced
    # and must be gone; v1's March files are referenced by v4's
    # manifest and must still exist
    assert not any(os.path.exists(f) for f in jan_v1), jan_v1
    assert all(os.path.exists(f) for f in mar_v1), mar_v1
    m4 = pstore._manifest_of("ds.t", 4)["months"]
    assert m4["2020-03"] == m1["2020-03"]
    # and the surviving reads are complete
    snap = {
        r["key_id"]: r["v"] for r in pstore.get_table("ds.t", ts[3]).collect()
    }
    assert snap == {"a": 6.0, "b": 2.0, "c": 3.0}


def test_scoped_merge_carries_later_months_forward(spark, pstore):
    """A ``written_range``-scoped merge never reads or rewrites months
    after the range: their rows survive untouched (carried forward by
    manifest reference) even though they are absent from the incoming
    frame."""
    t1, t2 = T(2024, 1, 1), T(2024, 1, 2)
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)

    # complete snapshot of months <= Feb only; March is out of scope
    scoped = [
        ("a", 1.0, D(2020, 1, 10), D(2020, 1, 20)),
        ("b", 9.0, D(2020, 2, 10), D(2020, 2, 20)),
    ]
    pstore.update_snapshot(
        _df(spark, scoped), "ds.t", t2, written_range=(D(2020, 2, 1), D(2020, 2, 28))
    )

    m1 = pstore._manifest_of("ds.t", 1)["months"]
    m2 = pstore._manifest_of("ds.t", 2)["months"]
    # only February changed; January and (unscanned) March are the
    # SAME file references as v1 — zero data I/O for them
    assert m2["2020-01"] == m1["2020-01"]
    assert m2["2020-03"] == m1["2020-03"]
    assert set(m2["2020-02"]).isdisjoint(m1["2020-02"])

    snap2 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t2).collect()}
    assert snap2 == {"a": 1.0, "b": 9.0, "c": 3.0}
    snap1 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t1).collect()}
    assert snap1 == {"a": 1.0, "b": 2.0, "c": 3.0}


def test_scoped_merge_closes_vanished_rows_in_range(spark, pstore):
    """Omitting an in-scope row from a scoped update closes it, exactly
    as an unscoped full-compare would."""
    t1, t2 = T(2024, 1, 1), T(2024, 1, 2)
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)

    scoped = [("b", 2.0, D(2020, 2, 10), D(2020, 2, 20))]  # 'a' vanished
    pstore.update_snapshot(
        _df(spark, scoped), "ds.t", t2, written_range=(D(2020, 1, 1), D(2020, 2, 28))
    )
    snap2 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t2).collect()}
    assert snap2 == {"b": 2.0, "c": 3.0}
    snap1 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t1).collect()}
    assert snap1 == {"a": 1.0, "b": 2.0, "c": 3.0}


def test_scoped_merge_falls_back_on_range_violation(spark, pstore):
    """Incoming rows past the declared range trip the unscoped-redo
    guard; the result is the full-compare answer, not a corrupted
    scoped one."""
    t1, t2 = T(2024, 1, 1), T(2024, 1, 2)
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)

    violating = [
        ("a", 1.0, D(2020, 1, 10), D(2020, 1, 20)),
        ("b", 2.0, D(2020, 2, 10), D(2020, 2, 20)),
        ("c", 9.0, D(2020, 3, 10), None),  # March row, range says Feb
    ]
    pstore.update_snapshot(
        _df(spark, violating),
        "ds.t",
        t2,
        written_range=(D(2020, 1, 1), D(2020, 2, 28)),
    )
    snap2 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t2).collect()}
    assert snap2 == {"a": 1.0, "b": 2.0, "c": 9.0}
    snap1 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t1).collect()}
    assert snap1 == {"a": 1.0, "b": 2.0, "c": 3.0}


def test_scoped_merge_noop_skips_version(spark, pstore):
    t1 = T(2024, 1, 1)
    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", t1)
    scoped = [r for r in ROWS_V1 if r[3] is not None]  # Jan + Feb, unchanged
    pstore.update_snapshot(
        _df(spark, scoped), "ds.t", t1, written_range=(D(2020, 1, 1), D(2020, 2, 28))
    )
    assert pstore._current_version("ds.t") == 1


def test_compact_partitioned_is_partial_and_content_preserving(
    spark, pstore
):
    """Month-partitioned compaction is PARTIAL via the manifest: only
    months holding more than one file are read and rewritten (to one
    file each); already-compact months are carried forward by
    reference; a fully-compact table is a version-bump-free NO-OP;
    every snapshot is bit-identical throughout."""
    t1, t2 = T(2024, 1, 1), T(2024, 2, 1)
    # the file-size knob splits months across files -> fragmentation
    pstore.max_records_per_file = 10
    many = [
        (f"k{i}", float(i), D(2020, 1 + i % 2, 10), D(2020, 1 + i % 2, 20))
        for i in range(60)
    ] + [("solo", 1.0, D(2020, 3, 10), D(2020, 3, 20))]  # 1-file month
    pstore.update_snapshot(_df(spark, many), "ds.t", t1)
    pstore.update_snapshot(
        _df(
            spark,
            [("k0", 9.0, D(2020, 1, 10), D(2020, 1, 20))] + many[1:],
        ),
        "ds.t",
        t2,
    )
    pstore.max_records_per_file = None

    def snap(ts):
        return {
            (r["key_id"], r["v"])
            for r in pstore.get_table("ds.t", ts).collect()
        }

    before = {ts: snap(ts) for ts in (t1, t2)}
    v_before = pstore._current_version("ds.t")
    m_before = pstore._manifest_of("ds.t", v_before)["months"]

    def vc_groups(fs):
        out = {}
        for f in fs:
            vc = next(
                (c for c in f.split("/") if c.startswith("__vc=")), None
            )
            out.setdefault(vc, []).append(f)
        return out

    # fragmentation is per (month, __vc transaction-cluster) group:
    # one closed-rows file + one open-rows file IS the converged state
    frag = {
        m
        for m, fs in m_before.items()
        if any(len(g) > 1 for g in vc_groups(fs).values())
    }
    compact_m = {m for m, fs in m_before.items() if m not in frag}
    assert frag, "fixture produced no fragmented month"
    assert compact_m, "fixture produced no already-compact month"

    n_files = pstore.compact("ds.t")
    v_after = pstore._current_version("ds.t")
    assert v_after == v_before + 1
    m_after = pstore._manifest_of("ds.t", v_after)["months"]
    assert n_files == sum(len(fs) for fs in m_after.values())
    for m, fs in m_after.items():
        for vc, g in vc_groups(fs).items():
            assert len(g) == 1, (m, vc, g)
    # already-compact months carried forward by REFERENCE (same
    # files); fragmented months rewritten into the new segment
    for m in compact_m:
        assert m_after[m] == m_before[m]
    seg = pstore._manifest_of("ds.t", v_after)["dir"]
    for m in frag:
        assert all(f.startswith(seg + "/") for f in m_after[m])
    assert {ts: snap(ts) for ts in (t1, t2)} == before

    # fully compact now: another compact is a NO-OP (no version bump)
    assert pstore.compact("ds.t") == n_files
    assert pstore._current_version("ds.t") == v_after
    assert {ts: snap(ts) for ts in (t1, t2)} == before


def test_scoped_merge_read_never_touches_later_month_files(spark, pstore):
    """Execution-level proof (not plan-string matching) that the
    range-scoped merge's read side prunes months after the written
    range: input_file_name() over the max_valid_from-pruned read
    lists ONLY files of months at-or-before the bound — the parquet
    scan for a June backfill physically never opens July+ files."""
    from pyspark.sql import functions as F

    pstore.update_snapshot(_df(spark, ROWS_V1), "ds.t", T(2024, 1, 1))
    pruned = pstore.read_raw("ds.t", max_valid_from=D(2020, 2, 28))
    files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert files, "pruned read returned no files"
    assert all(
        f"{PARTITION_COL}=2020-01" in f or f"{PARTITION_COL}=2020-02" in f
        for f in files
    ), files


def test_null_valid_from_month_survives_scoped_merges(spark, pstore):
    """NULL valid_from rows live in the NULL_MONTH manifest segment;
    scoped merges must key them as that segment (a raw date_format
    month would be Python None: unsortable against string months and
    never matching the manifest key — the carried rows would vanish
    silently)."""
    from diseasystore_spark.storage.scd2 import NULL_MONTH

    t1, t2, t3 = T(2024, 1, 1), T(2024, 1, 2), T(2024, 1, 3)
    rows_v1 = [
        ("a", 1.0, D(2020, 1, 10), D(2020, 1, 20)),
        ("n", 7.0, None, None),  # NULL valid_from: NULL_MONTH segment
    ]
    pstore.update_snapshot(_df(spark, rows_v1), "ds.t", t1)
    m1 = pstore._manifest_of("ds.t", 1)["months"]
    assert NULL_MONTH in m1

    # Change ONLY the NULL-month row (plus keep January): the scoped
    # merge's changed-months set is exactly the NULL segment.
    rows_v2 = [
        ("a", 1.0, D(2020, 1, 10), D(2020, 1, 20)),
        ("n", 8.0, None, None),
    ]
    pstore.update_snapshot(_df(spark, rows_v2), "ds.t", t2)
    m2 = pstore._manifest_of("ds.t", 2)["months"]
    # January carried by reference; NULL month rewritten.
    assert m2["2020-01"] == m1["2020-01"]
    assert set(m2[NULL_MONTH]).isdisjoint(set(m1[NULL_MONTH]))
    snap2 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t2).collect()}
    assert snap2 == {"a": 1.0, "n": 8.0}

    # Change a dated month: the NULL month must carry by reference.
    rows_v3 = [
        ("a", 2.0, D(2020, 1, 10), D(2020, 1, 20)),
        ("n", 8.0, None, None),
    ]
    pstore.update_snapshot(_df(spark, rows_v3), "ds.t", t3)
    m3 = pstore._manifest_of("ds.t", 3)["months"]
    assert m3[NULL_MONTH] == m2[NULL_MONTH]
    snap3 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t3).collect()}
    assert snap3 == {"a": 2.0, "n": 8.0}
    # History intact across all three snapshots.
    snap1 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t1).collect()}
    assert snap1 == {"a": 1.0, "n": 7.0}


def test_compact_converges_under_max_records_per_file(spark, pstore):
    """With the file-size knob set, a month legitimately holding
    ceil(rows/N) files is NOT fragmented — compact() must reach a
    version-bump-free no-op instead of rewriting the table's largest
    months on every invocation forever."""
    t1, t2 = T(2024, 1, 1), T(2024, 2, 1)
    pstore.max_records_per_file = 10
    many = [
        (f"k{i}", float(i), D(2020, 1, 10), D(2020, 1, 20))
        for i in range(35)  # one month, ceil(35/10)=4 files achievable
    ]
    pstore.update_snapshot(_df(spark, many), "ds.t", t1)
    # second write fragments the month across two segments
    pstore.update_snapshot(
        _df(spark, [("k0", 9.0, D(2020, 1, 10), D(2020, 1, 20))] + many[1:]),
        "ds.t",
        t2,
    )
    v0 = pstore._current_version("ds.t")
    n1 = pstore.compact("ds.t")
    v1 = pstore._current_version("ds.t")
    # first compact may rewrite (history rows joined the month), but
    # the SECOND must be a no-op at the knob-achievable file count
    n2 = pstore.compact("ds.t")
    assert pstore._current_version("ds.t") == v1
    assert n2 == n1
    assert v1 <= v0 + 1
    snap = {
        (r["key_id"], r["v"]) for r in pstore.get_table("ds.t", t2).collect()
    }
    assert ("k0", 9.0) in snap and len(snap) == 35


def test_compact_enforces_size_cap_retroactively(spark, pstore):
    """A month whose file COUNT already equals the knob-achievable
    target but whose individual files exceed ``max_records_per_file``
    (written before the knob was set, or after it was lowered) IS
    fragmented: compact() must rewrite it so every file respects the
    cap — the size limit is enforced retroactively, not just the
    count (ADVICE r8)."""
    import glob

    import pyarrow.parquet as pq

    t1 = T(2024, 1, 1)
    # knob unset at write time -> one ~35-row file for the month
    many = [
        (f"k{i}", float(i), D(2020, 1, 10), D(2020, 1, 20))
        for i in range(35)
    ]
    pstore.update_snapshot(_df(spark, many), "ds.t", t1)
    v0 = pstore._current_version("ds.t")
    m0 = pstore._manifest_of("ds.t", v0)["months"]
    assert all(len(fs) == 1 for fs in m0.values())

    # knob now set BELOW the existing file size: the count target
    # (ceil(35/10)=4 > 1 file present) is met trivially, but the
    # single 35-row file violates the cap -> must be rewritten.
    pstore.max_records_per_file = 10
    n1 = pstore.compact("ds.t")
    v1 = pstore._current_version("ds.t")
    assert v1 == v0 + 1, "oversized single-file month was not rewritten"
    tdir = pstore._table_dir("ds.t")
    m1 = pstore._manifest_of("ds.t", v1)["months"]
    for m, fs in m1.items():
        for f in fs:
            rows = pq.ParquetFile(os.path.join(tdir, f)).metadata.num_rows
            assert rows <= 10, (m, f, rows)
    # converged: second compact is a version-bump-free no-op
    assert pstore.compact("ds.t") == n1
    assert pstore._current_version("ds.t") == v1
    snap = {
        (r["key_id"], r["v"]) for r in pstore.get_table("ds.t", t1).collect()
    }
    assert snap == {(f"k{i}", float(i)) for i in range(35)}


def test_compact_sweep_is_metadata_only_and_stable_under_knob_churn(
    spark, pstore, monkeypatch
):
    """VERDICT r9 item 8 + ADVICE r9: (a) per-file row counts are
    cached in the manifest at write time, so an all-compact no-op
    sweep on a knob-set store opens ZERO parquet footers; (b) under
    repeated compact() with mixed historical knob values the version
    count is stable — every knob change buys at most ONE rewrite,
    then the store converges to the no-op (no rewrite-every-call
    regression)."""
    from diseasystore_spark.storage import scd2 as scd2_mod

    t1, t2 = T(2024, 1, 1), T(2024, 2, 1)
    pstore.max_records_per_file = 10
    many = [
        (f"k{i}", float(i), D(2020, 1, 10), D(2020, 1, 20))
        for i in range(35)
    ] + [(f"m{i}", float(i), D(2020, 2, 5), None) for i in range(7)]
    pstore.update_snapshot(_df(spark, many), "ds.t", t1)
    pstore.update_snapshot(
        _df(spark, [("k0", 9.0, D(2020, 1, 10), D(2020, 1, 20))] + many[1:]),
        "ds.t",
        t2,
    )
    # manifest carries write-time per-file row counts for EVERY ref
    v = pstore._current_version("ds.t")
    man = pstore._manifest_of("ds.t", v)
    refs = [f for fs in man["months"].values() for f in fs]
    assert set(man.get("file_rows", {})) >= set(refs)

    pstore.compact("ds.t")  # converge once
    v1 = pstore._current_version("ds.t")

    # (a) the no-op sweep opens zero footers (metadata-only)
    opened: list[str] = []
    real_pf = scd2_mod.pq.ParquetFile

    def counting_pf(path, *a, **kw):
        opened.append(str(path))
        return real_pf(path, *a, **kw)

    monkeypatch.setattr(scd2_mod.pq, "ParquetFile", counting_pf)
    assert pstore.compact("ds.t") > 0
    assert pstore._current_version("ds.t") == v1
    data_opens = [p for p in opened if p.endswith(".parquet")]
    assert data_opens == [], data_opens
    monkeypatch.setattr(scd2_mod.pq, "ParquetFile", real_pf)

    # (b) knob churn: each change converges within one rewrite
    versions = [v1]
    for knob in (3, 25, None, 10, 10):
        pstore.max_records_per_file = knob
        pstore.compact("ds.t")
        va = pstore._current_version("ds.t")
        for _ in range(3):  # repeated compacts at held knob: no churn
            pstore.compact("ds.t")
        vb = pstore._current_version("ds.t")
        assert vb == va, (knob, va, vb)
        assert va <= versions[-1] + 1, (knob, versions, va)
        versions.append(vb)

    # logical content untouched through all of it
    snap = {
        (r["key_id"], r["v"]) for r in pstore.get_table("ds.t", t2).collect()
    }
    assert ("k0", 9.0) in snap and len(snap) == 42


def test_scoped_merge_never_touches_out_of_range_rows(spark, pstore):
    """Round-10 closure scoping: a scoped merge compares ONLY rows
    overlapping the declared range. (a) A backfill at a NEW slice_ts
    must not close rows entirely before the range (the reference
    keeps them via its re-include; we keep them by never making them
    close candidates) and must rewrite only the range's months.
    (b) Out-of-scope current rows sharing a CHANGED month with the
    range (sub-month update) must be carried into the rewrite."""
    t1, t2 = T(2024, 1, 1), T(2024, 2, 1)
    rows = [
        ("jan_a", 1.0, D(2020, 1, 5), D(2020, 1, 8)),    # before range
        ("feb_early", 2.0, D(2020, 2, 1), D(2020, 2, 5)),  # before range,
                                                           # same month
        ("feb_mid", 3.0, D(2020, 2, 10), D(2020, 2, 20)),  # in range
        ("mar_open", 4.0, D(2020, 3, 10), None),           # after range
    ]
    pstore.update_snapshot(_df(spark, rows), "ds.t", t1)
    v1 = pstore._current_version("ds.t")
    m1 = pstore._manifest_of("ds.t", v1)["months"]

    # NEW slice_ts, scoped to Feb 8..28: feb_mid revised, everything
    # else untouched (out of range)
    pstore.update_snapshot(
        _df(spark, [("feb_mid", 9.0, D(2020, 2, 10), D(2020, 2, 20))]),
        "ds.t",
        t2,
        written_range=(D(2020, 2, 8), D(2020, 2, 28)),
    )
    v2 = pstore._current_version("ds.t")
    assert v2 == v1 + 1
    m2 = pstore._manifest_of("ds.t", v2)["months"]

    # (a) only February was rewritten; January and March carry forward
    # by reference (identical file lists), and no out-of-range row was
    # closed at t2
    assert m2["2020-01"] == m1["2020-01"]
    assert m2["2020-03"] == m1["2020-03"]
    assert m2["2020-02"] != m1["2020-02"]
    snap2 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t2).collect()}
    assert snap2 == {
        "jan_a": 1.0,       # entirely before range: still open at t2
        "feb_early": 2.0,   # (b) same month, out of scope: carried
        "feb_mid": 9.0,     # in range: revised
        "mar_open": 4.0,    # after range: untouched
    }
    # t1's snapshot is untouched history
    snap1 = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t1).collect()}
    assert snap1 == {
        "jan_a": 1.0, "feb_early": 2.0, "feb_mid": 3.0, "mar_open": 4.0,
    }

    # a no-op scoped re-merge at yet another slice_ts bumps nothing
    t3 = T(2024, 3, 1)
    pstore.update_snapshot(
        _df(spark, [("feb_mid", 9.0, D(2020, 2, 10), D(2020, 2, 20))]),
        "ds.t",
        t3,
        written_range=(D(2020, 2, 8), D(2020, 2, 28)),
    )
    assert pstore._current_version("ds.t") == v2


def test_min_valid_until_prunes_closed_months_at_manifest(spark, pstore):
    """Round-10 lower-bound pruning: write-time month_stats (max
    valid_until + open flag, from the same parquet footers the
    row-count cache reads) let an overlap-clipped snapshot read skip
    months whose every row closed before the window — a narrow study
    period reads O(window + open months), not O(history)."""
    from pyspark.sql import functions as F

    t1 = T(2024, 1, 1)
    rows = [
        ("a", 1.0, D(2020, 1, 5), D(2020, 1, 20)),   # Jan: closed early
        ("b", 2.0, D(2020, 2, 5), D(2020, 2, 10)),   # Feb: closed early
        ("c", 3.0, D(2020, 3, 5), D(2020, 5, 15)),   # Mar: crosses to May
        ("d", 4.0, D(2020, 4, 2), None),             # Apr: OPEN
        ("e", 5.0, D(2020, 5, 2), D(2020, 5, 9)),    # May
    ]
    pstore.update_snapshot(_df(spark, rows), "ds.t", t1)
    ms = pstore._manifest_of("ds.t", 1).get("month_stats")
    assert ms is not None
    assert ms["2020-01"] == {"max_until": "2020-01-20", "open": False}
    assert ms["2020-04"]["open"] is True

    def months_of(df):
        return {
            p.split(f"{PARTITION_COL}=")[1].split("/")[0]
            for p in df.inputFiles()
        }

    full = pstore.get_table("ds.t", t1)
    assert len(months_of(full)) == 5
    window = pstore.get_table("ds.t", t1, min_valid_until=D(2020, 5, 1))
    # Jan+Feb pruned; Mar kept (crosses the window), Apr kept (open),
    # May kept
    assert months_of(window) == {"2020-03", "2020-04", "2020-05"}
    # identical results under the overlap clip the engine applies
    clip = (F.col("valid_until") > F.lit(D(2020, 5, 1))) | F.col(
        "valid_until"
    ).isNull()
    assert sorted(map(tuple, full.where(clip).collect())) == sorted(
        map(tuple, window.where(clip).collect())
    )
    # boundary: valid_until == min is prunable (half-open clip drops it)
    w2 = pstore.get_table("ds.t", t1, min_valid_until=D(2020, 1, 20))
    assert "2020-01" not in months_of(w2)

    # compaction rewrites keep stats fresh (recomputed from the new
    # files' footers), carried months inherit
    pstore.max_records_per_file = 2
    pstore.compact("ds.t")
    v = pstore._current_version("ds.t")
    ms2 = pstore._manifest_of("ds.t", v).get("month_stats")
    assert ms2["2020-01"] == {"max_until": "2020-01-20", "open": False}
    assert ms2["2020-04"]["open"] is True
    window3 = pstore.get_table("ds.t", t1, min_valid_until=D(2020, 5, 1))
    assert months_of(window3) == {"2020-03", "2020-04", "2020-05"}

    # ADVICE r10: an unparseable max_until (e.g. an ISO DATETIME
    # written by a hypothetical timestamp-typed valid_until) must
    # fail OPEN — the month is simply not pruned; the read never
    # crashes. Corrupt the live commit marker in place.
    import json as _json
    import os as _os

    marker_path = _os.path.join(
        pstore._commits_dir("ds.t"), f"{pstore._current_version('ds.t')}.json"
    )
    marker = _json.loads(pstore.commit_backend.get(marker_path))
    marker["month_stats"]["2020-01"]["max_until"] = "2020-01-20T00:00:00"
    pstore.commit_backend.put(marker_path, _json.dumps(marker).encode())
    w4 = pstore.get_table("ds.t", t1, min_valid_until=D(2020, 5, 1))
    assert "2020-01" in months_of(w4)  # not prunable, but readable
    assert "2020-02" not in months_of(w4)  # other stats still apply


def test_until_ts_axis_prunes_closed_history_files(spark, pstore):
    """Round-11 transaction-axis pruning (VERDICT r10 item 1): the
    writer clusters closed rows into ``__vc=c`` files and records
    per-file until/from stats in the manifest, so ``get_table``
    physically opens only the files that can contribute to the
    requested slice — a current-slice read of a multi-slice table
    never opens the closed-history files, and an as-of read of an
    OLD slice never opens files created after it. Pinned via
    inputFiles(); snapshot contents stay exact at every slice,
    including across compaction. Mirrors the reference's snapshot
    predicate ``R/2_FeatureHandler.R:90-96``."""
    t1, t2, t3 = T(2024, 1, 1), T(2024, 2, 1), T(2024, 3, 1)
    keys = [(m, k) for m in (1, 2, 3) for k in range(3)]

    def gen(v, months=(1, 2, 3)):
        return [
            (f"k{m}_{k}", v, D(2020, m, 10), D(2020, m, 20))
            for m, k in keys
            if m in months
        ]

    pstore.update_snapshot(_df(spark, gen(1.0)), "ds.t", t1)
    pstore.update_snapshot(_df(spark, gen(2.0)), "ds.t", t2)
    # t3 revises ONLY February: Jan/Mar carried forward by reference,
    # their transaction-axis stats INHERITED from the base manifest
    pstore.update_snapshot(
        _df(spark, gen(3.0, months=(2,))),
        "ds.t",
        t3,
        written_range=(D(2020, 2, 1), D(2020, 2, 28)),
    )

    def clusters(df):
        out = set()
        for p in df.inputFiles():
            m = p.split("__vm=")[1].split("/")[0]
            vc = p.split("__vc=")[1].split("/")[0] if "__vc=" in p else None
            out.add((m, vc))
        return out

    def snap(ts):
        return {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", ts).collect()}

    def check_all():
        cur = pstore.get_table("ds.t", t3)
        # current slice: zero closed-cluster files opened (Jan/Mar via
        # INHERITED stats, Feb via fresh ones)
        assert clusters(cur) == {
            ("2020-01", "o"), ("2020-02", "o"), ("2020-03", "o"),
        }
        assert snap(t3) == {
            f"k{m}_{k}": (3.0 if m == 2 else 2.0) for m, k in keys
        }
        # slice t2: Jan/Mar closed files pruned (all closed AT t2);
        # Feb's t2-rows now live in its closed file (closed at t3);
        # Feb's open file pruned on the FROM axis (created at t3)
        at2 = pstore.get_table("ds.t", t2)
        assert clusters(at2) == {
            ("2020-01", "o"), ("2020-03", "o"), ("2020-02", "c"),
        }
        assert snap(t2) == {f"k{m}_{k}": 2.0 for m, k in keys}
        # slice t1: only the closed-history files can answer it
        at1 = pstore.get_table("ds.t", t1)
        assert clusters(at1) == {
            ("2020-01", "c"), ("2020-02", "c"), ("2020-03", "c"),
        }
        assert snap(t1) == {f"k{m}_{k}": 1.0 for m, k in keys}

    check_all()
    # compaction rewrites keep the clustering AND the stats fresh
    pstore.compact("ds.t", full=True)
    check_all()


def _assert_manifest_stats_sound(pstore, table_id):
    """Invariant: every month_stats / until_stats / from_stats entry
    in the CURRENT manifest matches what the referenced parquet files
    actually contain (recomputed here from the raw footers via
    pyarrow, independent of the writer's code path)."""
    import datetime as dt

    import pyarrow.parquet as pq

    v = pstore._current_version(table_id)
    m = pstore._manifest_of(table_id, v)
    tdir = pstore._table_dir(table_id)
    ms = m.get("month_stats") or {}
    us = m.get("until_stats") or {}
    fs_ = m.get("from_stats") or {}

    def col_vals(path, col):
        import pyarrow.parquet as pq2

        t = pq2.read_table(path, columns=[col])
        vals = t.column(0).to_pylist()
        return [
            v.astimezone(dt.timezone.utc).replace(tzinfo=None)
            if isinstance(v, dt.datetime) and v.tzinfo is not None
            else v
            for v in vals
        ]

    for month, refs in m["months"].items():
        # month_stats: max(valid_until) / any-open over ALL the
        # month's rows
        if month in ms:
            vu = [
                x
                for r in refs
                for x in col_vals(f"{tdir}/{r}", "valid_until")
            ]
            has_open = any(x is None for x in vu)
            mx = max((x for x in vu if x is not None), default=None)
            assert ms[month]["open"] == has_open, month
            expect = mx.isoformat() if (mx and not has_open) else ms[month]["max_until"]
            if not has_open:
                assert ms[month]["max_until"] == expect, month
        for r in refs:
            ut = col_vals(f"{tdir}/{r}", "until_ts")
            ft = col_vals(f"{tdir}/{r}", "from_ts")
            if r in us:
                assert all(x is not None for x in ut), r
                assert dt.datetime.fromisoformat(us[r]) == max(ut), r
            if r in fs_:
                assert dt.datetime.fromisoformat(fs_[r]) == min(
                    x for x in ft if x is not None
                ), r


def test_prune_history_keeps_manifest_stats_sound(spark, pstore):
    """VERDICT r10 item 6: prune_history physically drops long-closed
    rows, which can change a month's max(valid_until), its max
    (until_ts) and its file layout — every manifest stats family must
    be refreshed (the rewrite recomputes them from the new footers),
    or pruning decisions would be made against stale bounds. Churn:
    write / revise / prune / compact / revise again, asserting the
    footer-recomputed invariant and snapshot identity at every step."""
    t = [T(2024, 1, d) for d in (1, 2, 3, 4, 5)]
    rows1 = [
        ("a", 1.0, D(2020, 1, 5), D(2020, 1, 31)),
        ("b", 2.0, D(2020, 1, 7), D(2020, 1, 9)),
        ("c", 3.0, D(2020, 2, 5), None),
    ]
    pstore.update_snapshot(_df(spark, rows1), "ds.t", t[0])
    # t1 revision closes 'a' (its valid_until 2020-01-31 was January's
    # max) and replaces it with a shorter validity
    rows2 = [
        ("a", 1.5, D(2020, 1, 5), D(2020, 1, 12)),
        ("b", 2.0, D(2020, 1, 7), D(2020, 1, 9)),
        ("c", 3.0, D(2020, 2, 5), None),
    ]
    pstore.update_snapshot(_df(spark, rows2), "ds.t", t[1])
    _assert_manifest_stats_sound(pstore, "ds.t")
    ms = pstore._manifest_of(
        "ds.t", pstore._current_version("ds.t")
    ).get("month_stats")
    assert ms["2020-01"] == {"max_until": "2020-01-31", "open": False}

    # prune everything closed at-or-before t2: drops the old 'a' row,
    # January's true max(valid_until) shrinks to 01-12
    dropped = pstore.prune_history("ds.t", t[1])
    assert dropped == 1
    _assert_manifest_stats_sound(pstore, "ds.t")
    ms2 = pstore._manifest_of(
        "ds.t", pstore._current_version("ds.t")
    ).get("month_stats")
    assert ms2["2020-01"] == {"max_until": "2020-01-12", "open": False}
    # a min_valid_until read AFTER the prune uses the refreshed bound:
    # January now prunable at a window the stale stats would have kept
    w = pstore.get_table("ds.t", t[1], min_valid_until=D(2020, 1, 20))
    assert not any("__vm=2020-01" in p for p in w.inputFiles())

    # churn on: compact, revise, prune again — invariant holds
    pstore.max_records_per_file = 1
    pstore.compact("ds.t")
    _assert_manifest_stats_sound(pstore, "ds.t")
    rows3 = [
        ("a", 9.0, D(2020, 1, 5), D(2020, 1, 25)),
        ("b", 2.0, D(2020, 1, 7), D(2020, 1, 9)),
        ("c", 3.5, D(2020, 2, 5), None),
    ]
    pstore.update_snapshot(_df(spark, rows3), "ds.t", t[2])
    _assert_manifest_stats_sound(pstore, "ds.t")
    pstore.prune_history("ds.t", t[2])
    _assert_manifest_stats_sound(pstore, "ds.t")
    snap = {r["key_id"]: r["v"] for r in pstore.get_table("ds.t", t[3]).collect()}
    assert snap == {"a": 9.0, "b": 2.0, "c": 3.5}
