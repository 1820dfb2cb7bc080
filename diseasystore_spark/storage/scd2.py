"""SCD2 (type-2 slowly-changing-dimension) feature storage on parquet.

The reference delegates storage to the SCDB package: each feature
table carries ``checksum`` / ``from_ts`` / ``until_ts`` bookkeeping
columns; ``SCDB::update_snapshot`` checksums incoming rows, closes
``until_ts`` on vanished rows and opens ``from_ts`` on new rows at the
write timestamp; ``SCDB::get_table(conn, tbl, slice_ts)`` reads the
transaction-time snapshot ``from_ts <= slice_ts < until_ts``
(``vignettes/extending-diseasystore.Rmd:46-55``,
``R/2_FeatureHandler.R:90-96``, call-site
``R/DiseasystoreBase.R:231-239``).

Spark design — logical snapshots, not physical versions: the
``slice_ts`` semantics are *column-encoded*, so "the world as of
2021-01-01" is answerable for data loaded today (file-format
time-travel alone cannot do that). Layout:

    <root>/<schema>/<table>/_v{N}-{token}/...      -- immutable data segment
        __vm=YYYY-MM/__vc={c|o}/part-*.parquet        (month-partitioned;
                                                       __vc clusters closed
                                                       vs open rows)
        part-*.parquet                                (flat)
    <root>/<schema>/<table>/_commits/{N}.json      -- marker + MANIFEST
    <root>/<schema>/logs/*.parquet                 -- append-only log sink

Commit protocol — object-store-safe, no rename, no links: each write
lands its changed rows in a uniquely-named immutable segment
directory, then claims version N by a PUT-IF-ABSENT of the commit
marker ``_commits/{N}.json`` whose body IS the version's **manifest**
— the complete file listing of the version, per month on partitioned
tables (Iceberg-style). Unchanged months are carried forward by
REFERENCE: the new manifest repeats the previous manifest's entries
for them, so a commit costs O(changed months) data I/O plus one small
conditional put, independent of how many months the table spans.
Readers resolve a version to its exact file set from the manifest
alone — no directory LIST on the data plane, and month pruning
(``max_valid_from``) happens at the MANIFEST before any file is
opened, which is strictly earlier than Catalyst partition pruning.

The conditional put runs through a pluggable :class:`CommitBackend`
(``storage/backends.py``): locally ``os.link`` of a fully-written
temp file; on an object store a conditional PUT (S3 ``If-None-Match:
*`` / GCS ``ifGenerationMatch=0`` / Azure ETag). The in-memory
``MemoryCommitBackend`` double runs the full concurrency suite over
exactly that primitive surface — no links, no renames — proving the
protocol object-store-clean. Two concurrent writers racing for
version N cannot both win: exactly one conditional put succeeds; the
loser's orphan segment is removed and the caller retries its merge
against the now-newer table (optimistic concurrency, the Delta/
Iceberg commit loop). Readers never see a torn state — a marker is
either fully present or absent, and every file its manifest names was
durably written before the marker existed (its own segment's files by
write order; referenced older files by induction from the commit that
introduced them). GC is manifest-driven keep-2: files referenced only
by dropped manifests are deleted file-by-file; an unreferenced
segment directory (crash leftover) is swept only once clearly
abandoned. Legacy layouts (``_CURRENT`` pointer, marker-names-a-dir)
are still readable; the first write on top of one migrates the table
to a manifest via an unscoped rewrite.

Scale path: with ``partition_granularity="month"``, each version is
partitioned by ``month(valid_from)`` and a merge rewrites only months
containing a changed row — ``update_snapshot`` is always scoped to a
date range, so the rewrite is O(touched partitions), the same pruning
a Delta ``MERGE`` on checksum would achieve. The merge plan itself
(two anti joins + a semi join on ``checksum``) shuffles only on the
checksum key and is AQE-friendly.

Without the Delta jars in this environment the parquet+manifest
layout is the honest equivalent; the class isolates all physical I/O
so a Delta backend can be slotted in behind the same five methods.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from diseasystore_spark.contract import SCD2_COLUMNS
from diseasystore_spark.storage.backends import (
    CommitBackend,
    LocalCommitBackend,
    MemoryCommitBackend,
)

LOGS_TABLE = "logs"

#: partition-directory name parquet uses for a NULL partition value —
#: a month key that can never be pruned by a date cutoff.
NULL_MONTH = "__HIVE_DEFAULT_PARTITION__"


class CommitConflictError(RuntimeError):
    """Another writer committed this version number first. The caller
    must re-read the table (now at a newer version) and re-apply its
    merge — ``update_snapshot`` and the maintenance ops do this
    automatically via ``_with_commit_retry``."""

    def __init__(self, table_id: str, version: int):
        super().__init__(
            f"commit conflict on {table_id} version {version}: another"
            " writer won the conditional put; retry against the new"
            " current version"
        )
        self.table_id = table_id
        self.version = version

_LOG_SCHEMA = T.StructType(
    [
        T.StructField("date", T.TimestampType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("log_file", T.StringType()),
    ]
)


def normalize_slice_ts(
    slice_ts: str | datetime.date | datetime.datetime | None,
) -> datetime.datetime:
    """Accept Date / timestamp / ISO string (the reference accepts all
    three, ``R/DiseasystoreBase.R:43-48``); normalize to a datetime."""
    if slice_ts is None:
        slice_ts = datetime.date.today()
    if isinstance(slice_ts, str):
        for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
            try:
                return datetime.datetime.strptime(slice_ts, fmt)
            except ValueError:
                continue
        raise ValueError(f"unparseable slice_ts: {slice_ts!r}")
    if isinstance(slice_ts, datetime.datetime):
        return slice_ts
    return datetime.datetime.combine(slice_ts, datetime.time())


def row_checksum(columns: list[str]) -> F.Column:
    """Deterministic row checksum over the data columns (sorted by name
    for stability), NULL-distinguishing. Mirrors SCDB's
    ``digest_to_checksum`` role; sha256 via the JVM-side ``sha2``."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
        for c in sorted(columns)
    ]
    return F.sha2(F.concat_ws("\x1f", *parts), 256)


PARTITION_COL = "__vm"

#: second hive-partition level inside each month dir — transaction-
#: axis clustering: ``c`` = closed rows (``until_ts`` set), ``o`` =
#: open rows. Like PARTITION_COL it is derived (from ``until_ts``),
#: never stored in row data, and never surfaced to readers.
TXN_CLUSTER_COL = "__vc"


class ParquetFeatureStore:
    """SCD2 storage. ``partition_granularity="month"`` enables the
    scale layout: each version is hive-partitioned by
    ``month(valid_from)``; merges rewrite only partitions whose rows
    changed and carry the untouched months forward by MANIFEST
    REFERENCE (no links, no copies) — the Iceberg pattern, and the
    equivalent of a Delta MERGE touching only affected files."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        partition_granularity: str | None = None,
        commit_backend: CommitBackend | None = None,
        max_records_per_file: int | None = None,
    ):
        if partition_granularity not in (None, "month"):
            raise ValueError("partition_granularity must be None or 'month'")
        if max_records_per_file is not None and max_records_per_file < 1:
            raise ValueError("max_records_per_file must be >= 1")
        self.spark = spark
        self.root = root
        self.partition_granularity = partition_granularity
        #: the file-size knob at real scale (Spark's own
        #: maxRecordsPerFile): a giant month splits into bounded
        #: files at write time instead of one task emitting one
        #: multi-GB file; merges then re-fragment months over time,
        #: and compact() re-bounds them via the manifest's per-month
        #: file counts — O(fragmented months), see _compact_attempt.
        self.max_records_per_file = max_records_per_file
        if commit_backend is None:
            # SPARK_GRAFT_COMMIT_BACKEND=memory runs every store in the
            # process against the object-store double — the switch the
            # oracle sweep uses to prove the engine green over both.
            kind = os.environ.get("SPARK_GRAFT_COMMIT_BACKEND", "local")
            commit_backend = (
                MemoryCommitBackend.shared(root)
                if kind == "memory"
                else LocalCommitBackend()
            )
        self.commit_backend = commit_backend
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _table_dir(self, table_id: str) -> str:
        schema, _, table = table_id.partition(".")
        return os.path.join(self.root, schema, table)

    def _commits_dir(self, table_id: str) -> str:
        return os.path.join(self._table_dir(table_id), "_commits")

    def _current_version(self, table_id: str) -> int | None:
        """Highest committed version: max marker in ``_commits/``
        (one control-plane LIST + max — exactly what a Delta log tail
        read costs on an object store). Falls back to a legacy
        ``_CURRENT`` pointer file for tables written by older
        layouts."""
        versions = [
            int(f[: -len(".json")])
            for f in self.commit_backend.list(self._commits_dir(table_id))
            if f.endswith(".json")
        ]
        if versions:
            return max(versions)
        pointer = os.path.join(self._table_dir(table_id), "_CURRENT")
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            return int(fh.read().strip())

    def _read_marker(self, table_id: str, version: int) -> dict | None:
        """The commit marker (manifest included) for ``version``;
        None when absent (legacy ``_v{N}``/``_CURRENT`` layouts, or a
        marker GC'd because the table advanced 2+ versions)."""
        raw = self.commit_backend.get(
            os.path.join(self._commits_dir(table_id), f"{version}.json")
        )
        if raw is None:
            return None
        return json.loads(raw)

    def _version_dir(self, table_id: str, version: int) -> str:
        """The segment directory CREATED by ``version``'s write (for
        a manifest version this holds the changed months only —
        resolve full content via ``_version_files``); legacy layout
        fallback: ``_v{N}``."""
        marker = self._read_marker(table_id, version)
        name = marker["dir"] if marker else f"_v{version}"
        return os.path.join(self._table_dir(table_id), name)

    def _manifest_of(self, table_id: str, version: int) -> dict | None:
        """The version's manifest (``{"months": {...}}`` or
        ``{"files": [...]}``), or None when the version predates the
        manifest layout (legacy dir-marker / bare ``_v{N}``)."""
        marker = self._read_marker(table_id, version)
        if marker and ("months" in marker or "files" in marker):
            return marker
        return None

    def _version_files(
        self,
        table_id: str,
        version: int,
        month_max: str | None = None,
        min_valid_until: datetime.date | None = None,
        slice_ts: datetime.datetime | None = None,
    ) -> list[str] | None:
        """Absolute parquet paths making up ``version``, pruned at
        the MANIFEST to months ``<= month_max`` (NULL-month files are
        never pruned — their rows carry no ``valid_from``). None for
        legacy layouts (read those via directory listing).

        ``min_valid_until`` additionally drops months whose write-time
        validity stats prove every row CLOSED at-or-before it (no
        open rows, ``max(valid_until) <= min_valid_until``) — sound
        ONLY for consumers that filter ``valid_until > min OR
        valid_until IS NULL`` downstream (the study-period overlap
        clip). Months without stats are never pruned.

        ``slice_ts`` prunes on the TRANSACTION axis: files whose
        write-time footer stats prove every row invisible to the
        snapshot at that instant — all rows closed at-or-before it
        (``until_stats``), or all rows created after it
        (``from_stats``) — are dropped. Unconditionally sound for
        any consumer applying the snapshot predicate ``from_ts <=
        slice_ts AND (until_ts IS NULL OR until_ts > slice_ts)``;
        files without stats are never pruned."""
        manifest = self._manifest_of(table_id, version)
        if manifest is None:
            return None
        tdir = self._table_dir(table_id)
        if "files" in manifest:
            rels = manifest["files"]
        else:
            stats = (
                manifest.get("month_stats") or {}
                if min_valid_until is not None
                else {}
            )

            def closed_before_window(m: str) -> bool:
                s = stats.get(m)
                if s is None or s.get("open") or s.get("max_until") is None:
                    return False
                try:
                    mx = datetime.date.fromisoformat(s["max_until"])
                except ValueError:
                    # Fail OPEN: an unparseable max_until (e.g. a
                    # stats entry written by a different version)
                    # means "not prunable", never a crashed read
                    # (ADVICE r10).
                    return False
                return mx <= min_valid_until

            rels = [
                f
                for m, fs in manifest["months"].items()
                if (
                    month_max is None or m == NULL_MONTH or m <= month_max
                )
                and not (m != NULL_MONTH and closed_before_window(m))
                for f in fs
            ]
        if slice_ts is not None:
            ustats = manifest.get("until_stats") or {}
            fstats = manifest.get("from_stats") or {}
            if ustats or fstats:

                def invisible_at_slice(r: str) -> bool:
                    u = ustats.get(r)
                    if u is not None:
                        try:
                            if datetime.datetime.fromisoformat(u) <= slice_ts:
                                return True  # every row closed by then
                        except ValueError:
                            pass  # fail open: not prunable
                    f = fstats.get(r)
                    if f is not None:
                        try:
                            return datetime.datetime.fromisoformat(f) > slice_ts
                        except ValueError:
                            return False
                    return False

                rels = [r for r in rels if not invisible_at_slice(r)]
        return [os.path.join(tdir, r) for r in rels]

    def _put_if_absent(self, path: str, data: bytes) -> bool:
        """Conditional put: create ``path`` with ``data`` iff it does
        not exist; False when another writer got there first. The one
        storage primitive the commit protocol needs — delegated to the
        pluggable :class:`CommitBackend` (``os.link`` locally; a
        conditional PUT on an object store; compare-and-set in the
        in-memory double). Kept as a method so the concurrency suite
        can interpose race injections at the exact commit point."""
        return self.commit_backend.put_if_absent(path, data)

    #: minimum age (mtime) before an UNCOMMITTED attempt directory may
    #: be swept by commit-time GC. A live concurrent writer's in-flight
    #: directory is uncommitted but young; sweeping it mid-write would
    #: fail its Spark job with an IO error that escapes the optimistic
    #: retry loop. Committed-then-superseded directories are resolved
    #: via their markers and need no age check.
    _ORPHAN_RETENTION_SECS = 3600.0

    @staticmethod
    def _manifest_refs(manifest: dict) -> list[str]:
        """Every data-file relpath a marker's manifest references."""
        if "files" in manifest:
            return list(manifest["files"])
        if "months" in manifest:
            return [f for fs in manifest["months"].values() for f in fs]
        return []

    def _commit_version(
        self, table_id: str, version: int, manifest: dict
    ) -> None:
        """Claim ``version`` by conditional put of its marker — whose
        body is the version's complete manifest; raise
        ``CommitConflictError`` if another writer already committed
        that number. On success, manifest-driven GC (keep-2):

        - markers older than ``version-1`` are dropped; data files
          they reference are deleted ONLY when no retained manifest
          still references them (unchanged months live on by
          reference across many versions);
        - a stale legacy (dir-naming) marker drops its whole
          directory, as before;
        - segment directories named by NO marker at all are crash
          leftovers — swept only once older than
          ``_ORPHAN_RETENTION_SECS``, never a concurrent writer's
          still-being-written attempt directory.
        """
        cdir = self._commits_dir(table_id)
        marker = os.path.join(cdir, f"{version}.json")
        if not self._put_if_absent(marker, json.dumps(manifest).encode()):
            raise CommitConflictError(table_id, version)
        tdir = self._table_dir(table_id)

        # Inventory the marker log ONCE (control-plane LIST + GETs).
        markers: dict[int, dict] = {}
        for entry in self.commit_backend.list(cdir):
            if not entry.endswith(".json"):
                continue
            try:
                v = int(entry[: -len(".json")])
            except ValueError:
                continue
            raw = self.commit_backend.get(os.path.join(cdir, entry))
            if raw is None:
                continue
            try:
                markers[v] = json.loads(raw)
            except ValueError:
                continue

        live_files: set[str] = set()
        live_dirs: set[str] = set()
        for v, m in markers.items():
            if v < version - 1:
                continue
            refs = self._manifest_refs(m)
            live_files.update(refs)
            if m.get("stats"):
                live_files.add(m["stats"])
            if m.get("dir"):
                live_dirs.add(m["dir"])
            live_dirs.update(r.split("/", 1)[0] for r in refs)

        for v, m in sorted(markers.items()):
            if v >= version - 1:
                continue
            refs = self._manifest_refs(m)
            if refs or "files" in m or "months" in m:
                dead = [r for r in refs if r not in live_files]
                if m.get("stats") and m["stats"] not in live_files:
                    dead.append(m["stats"])
                for rel in dead:
                    abspath = os.path.join(tdir, rel)
                    for victim in (
                        abspath,
                        # Hadoop LocalFileSystem checksum sibling
                        os.path.join(
                            os.path.dirname(abspath),
                            f".{os.path.basename(abspath)}.crc",
                        ),
                    ):
                        try:
                            os.unlink(victim)
                        except FileNotFoundError:
                            pass
                    # prune now-empty month/segment dirs (never tdir)
                    parent = os.path.dirname(abspath)
                    while len(parent) > len(tdir):
                        try:
                            os.rmdir(parent)
                        except OSError:
                            break
                        parent = os.path.dirname(parent)
            elif m.get("dir") and m["dir"] not in live_dirs:
                shutil.rmtree(
                    os.path.join(tdir, m["dir"]), ignore_errors=True
                )
            self.commit_backend.delete(os.path.join(cdir, f"{v}.json"))

        committed_dirs = live_dirs | {
            m["dir"] for m in markers.values() if m.get("dir")
        }
        now = time.time()
        for entry in os.listdir(tdir):
            if not entry.startswith("_v") or entry in committed_dirs:
                continue
            path = os.path.join(tdir, entry)
            if not os.path.isdir(path):
                continue
            stem, _, token = entry[2:].partition("-")
            try:
                v = int(stem)
            except ValueError:
                continue
            if not token:
                # Legacy bare ``_v{N}``: committed via the old
                # _CURRENT pointer — its name is its version.
                if v < version - 1:
                    shutil.rmtree(path, ignore_errors=True)
                continue
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                continue
            if age > self._ORPHAN_RETENTION_SECS:
                shutil.rmtree(path, ignore_errors=True)

    # ------------------------------------------------------------ catalog
    def table_exists(self, table_id: str) -> bool:
        return self._current_version(table_id) is not None

    def list_tables(self, schema: str) -> list[str]:
        sdir = os.path.join(self.root, schema)
        if not os.path.isdir(sdir):
            return []
        out = []
        for entry in sorted(os.listdir(sdir)):
            if entry == LOGS_TABLE and os.path.isdir(os.path.join(sdir, entry)):
                out.append(f"{schema}.{entry}")
            elif self._current_version(f"{schema}.{entry}") is not None:
                out.append(f"{schema}.{entry}")
        return out

    def drop_table(self, table_id: str) -> None:
        # control-plane objects first (markers, retain floor) so a
        # crash mid-drop leaves an unreachable table, not a reachable
        # table with missing data
        cdir = self._commits_dir(table_id)
        for entry in self.commit_backend.list(cdir):
            self.commit_backend.delete(os.path.join(cdir, entry))
        self.commit_backend.delete(self._retain_floor_path(table_id))
        shutil.rmtree(self._table_dir(table_id), ignore_errors=True)

    # -------------------------------------------------------------- reads
    def _read_raw_partitioned(
        self,
        table_id: str,
        version: int | None = None,
        month_max: str | None = None,
        min_valid_until: datetime.date | None = None,
        slice_ts: datetime.datetime | None = None,
    ) -> DataFrame:
        """Scan a committed version. Manifest versions resolve to an
        exact FILE list — ``month_max`` prunes months at the manifest,
        before any file is listed or opened (strictly earlier than
        Catalyst partition pruning, and the only LIST the read ever
        does is the one control-plane marker GET). Legacy versions
        fall back to a directory read with partition discovery."""
        if version is None:
            version = self._current_version(table_id)
        if version is None:
            raise FileNotFoundError(f"table {table_id} does not exist")
        files = self._version_files(
            table_id,
            version,
            month_max=month_max,
            min_valid_until=min_valid_until,
            slice_ts=slice_ts,
        )
        if files is None:  # legacy layout
            return self.spark.read.parquet(
                self._version_dir(table_id, version)
            )
        if not files:
            # every month pruned: empty frame with the version's schema
            allf = self._version_files(table_id, version)
            if not allf:
                raise FileNotFoundError(
                    f"table {table_id} version {version} has no data files"
                )
            return self.spark.read.parquet(allf[0]).where(F.lit(False))
        return self.spark.read.parquet(*files)

    def read_raw(
        self, table_id: str, max_valid_from=None, version: int | None = None
    ) -> DataFrame:
        """Full SCD2 table (bookkeeping columns included; the internal
        partition column is hidden). ``max_valid_from`` (a date) prunes
        month partitions strictly after it on a partitioned table.
        ``version`` pins the read to a specific committed version —
        write attempts pass their captured base version so the merge
        plan and the commit claim agree on the same base (see
        ``_write_version``)."""
        month_max = (
            max_valid_from.strftime("%Y-%m")
            if max_valid_from is not None
            else None
        )
        df = self._read_raw_partitioned(
            table_id, version=version, month_max=month_max
        )
        if PARTITION_COL in df.columns:  # legacy directory layout
            if month_max is not None:
                df = df.where(F.col(PARTITION_COL) <= month_max)
            df = df.drop(PARTITION_COL)
        return df

    def get_table(
        self,
        table_id: str,
        slice_ts,
        max_valid_from=None,
        min_valid_until: datetime.date | None = None,
    ) -> DataFrame:
        """Transaction-time snapshot read: ``from_ts <= slice_ts AND
        (until_ts IS NULL OR until_ts > slice_ts)``, bookkeeping
        dropped (``R/2_FeatureHandler.R:90-96``).

        ``max_valid_from`` (a date): on a month-partitioned table,
        months strictly after it are pruned at the MANIFEST — the file
        list handed to Spark never contains them (the study-period
        clip's upper bound costs zero scan and zero listing).

        ``min_valid_until`` (a date): the LOWER-bound twin — months
        whose write-time validity stats prove every row closed
        at-or-before it (``month_stats``: no open rows,
        ``max(valid_until) <= min``) are pruned at the manifest too.
        ONLY pass this when the caller filters the result with the
        half-open overlap clip (``valid_until > min OR NULL``), as
        the engine's study-period clip does: the pruned rows are
        exactly those the clip would drop, so a narrow window reads
        O(window + open-row months), not O(history).

        The TRANSACTION axis prunes automatically (round 11): the
        writer clusters closed rows into their own files
        (``__vc=c``) and records per-file ``until_stats`` /
        ``from_stats``, so files whose every row is invisible at
        ``slice_ts`` — closed at-or-before it, or created after it —
        are dropped at the manifest. The predicate above would
        discard those rows anyway, so this is sound for every
        caller; a current-slice read of a long-history table scans
        O(live rows), not O(closed history).
        """
        ts = normalize_slice_ts(slice_ts)
        floor = self.retain_floor(table_id)
        if floor is not None and ts < floor:
            raise ValueError(
                f"slice_ts {ts} is below {table_id}'s retention floor "
                f"{floor}: that history was pruned (prune_history)"
            )
        month_max = (
            max_valid_from.strftime("%Y-%m")
            if max_valid_from is not None
            else None
        )
        raw = self._read_raw_partitioned(
            table_id,
            month_max=month_max,
            min_valid_until=min_valid_until,
            slice_ts=ts,
        )
        if PARTITION_COL in raw.columns:  # legacy directory layout
            if month_max is not None:
                raw = raw.where(F.col(PARTITION_COL) <= month_max)
            raw = raw.drop(PARTITION_COL)
        return raw.where(
            (F.col("from_ts") <= F.lit(ts))
            & (F.col("until_ts").isNull() | (F.col("until_ts") > F.lit(ts)))
        ).drop(*SCD2_COLUMNS)

    # ------------------------------------------------------------- writes
    def _retain_floor_path(self, table_id: str) -> str:
        return os.path.join(self._table_dir(table_id), "_RETAIN_FLOOR")

    def retain_floor(self, table_id: str):
        """Earliest ``slice_ts`` still fully answerable (None = all
        history retained). A small control object on the commit
        backend (an overwritable PUT — it only ever moves forward, and
        a stale read is safe: it just permits a read the pruned data
        can still answer is refused later)."""
        raw = self.commit_backend.get(self._retain_floor_path(table_id))
        if raw is None:
            return None
        return datetime.datetime.fromisoformat(raw.decode().strip())

    #: optimistic-concurrency retry bound: each retry re-reads the
    #: (now newer) current version and re-derives the write from it,
    #: so N retries tolerate N concurrent winners — far beyond any
    #: sane writer fan-in on one feature table.
    _COMMIT_RETRIES = 5

    def _with_commit_retry(self, fn):
        """Run a write closure under the optimistic commit loop: on
        ``CommitConflictError`` the closure is re-invoked, which
        rebuilds its merge plan against the table as the winning
        writer left it (every write method resolves the current
        version at call time, so a plain re-call IS the re-read)."""
        last: CommitConflictError | None = None
        for _ in range(self._COMMIT_RETRIES):
            try:
                return fn()
            except CommitConflictError as err:
                last = err
        raise last

    def prune_history(self, table_id: str, older_than) -> int:
        """Retrying wrapper over ``_prune_history_attempt`` (see its
        docstring); safe to re-run because the attempt re-reads the
        current version."""
        return self._with_commit_retry(
            lambda: self._prune_history_attempt(table_id, older_than)
        )

    def _prune_history_attempt(self, table_id: str, older_than) -> int:
        """Retention (the logical VACUUM): physically drop SCD2 rows
        whose ``until_ts <= older_than`` — rows invisible to every
        snapshot at or after the cutoff (``until_ts > ts`` already
        excludes them there). Snapshots at ``slice_ts >= older_than``
        are bit-identical before and after; earlier slices become
        unanswerable, so the cutoff is recorded as the table's retain
        floor and ``get_table`` refuses reads below it (fail-loud
        instead of silently incomplete). Returns rows dropped.

        One full-version rewrite (like ``evolve_schema``); run it at
        retention cadence, not per write."""
        cutoff = normalize_slice_ts(older_than)
        base = self._current_version(table_id)
        existing = self.read_raw(table_id, version=base)
        keep = existing.where(
            F.col("until_ts").isNull() | (F.col("until_ts") > F.lit(cutoff))
        )
        dropped = existing.count() - keep.count()
        # Persist the retain floor BEFORE physically dropping history:
        # a crash between the two steps then fails loud (floor set,
        # data intact — reads below the cutoff refused) instead of
        # silent (history pruned but reads below the cutoff still
        # permitted against an incomplete snapshot).
        prev = self.retain_floor(table_id)
        if prev is None or cutoff > prev:
            self.commit_backend.put(
                self._retain_floor_path(table_id),
                cutoff.isoformat().encode(),
            )
        if dropped:
            self._write_version(
                keep, table_id, changed_months=None, base_version=base
            )
        return dropped

    def snapshot_diff(self, table_id: str, ts_a, ts_b) -> DataFrame:
        """What changed between two logical snapshots — computed from
        the SCD2 transaction-time intervals alone, ONE scan, no join
        (the naive form is two snapshot reads + two full-width
        anti-joins):

        - ``added``   (in B, not in A): ``from_ts  in (a, b]`` and
          alive at b;
        - ``removed`` (in A, not in B): alive at a and
          ``until_ts in (a, b]``.

        A value revision is one ``removed`` (the closed row) plus one
        ``added`` (its replacement); a transient row both created and
        closed inside ``(a, b]`` appears in neither snapshot and is
        correctly excluded by the alive conditions. The diff is
        CONTENT-exact, not interval-churn: a row removed and later
        re-added with identical content between the slices nets to no
        change — a per-checksum rollup cancels the interval pair (the
        checksum IS the logical row identity the merge dedups on).
        Output: payload columns + ``change`` ('added' | 'removed').
        """
        a, b = normalize_slice_ts(ts_a), normalize_slice_ts(ts_b)
        if not a < b:
            raise ValueError(f"ts_a must precede ts_b (got {a} >= {b})")
        floor = self.retain_floor(table_id)
        if floor is not None and a < floor:
            raise ValueError(
                f"slice_ts {a} is below {table_id}'s retention floor "
                f"{floor}: that history was pruned (prune_history)"
            )
        raw = self.read_raw(table_id)
        alive_a = (F.col("from_ts") <= F.lit(a)) & (
            F.col("until_ts").isNull() | (F.col("until_ts") > F.lit(a))
        )
        alive_b = (F.col("from_ts") <= F.lit(b)) & (
            F.col("until_ts").isNull() | (F.col("until_ts") > F.lit(b))
        )
        change = (
            F.when(~alive_a & alive_b, F.lit("added"))
            .when(alive_a & ~alive_b, F.lit("removed"))
        )
        payload = [c for c in raw.columns if c not in SCD2_COLUMNS]
        flagged = raw.withColumn("change", change).where(
            F.col("change").isNotNull()
        )
        # Per-checksum net: at most one 'added' and one 'removed'
        # interval can carry flags for a given logical row (the merge
        # keeps checksums unique among open rows), so the net is -1,
        # 0, or +1; zero = content unchanged (left and came back).
        return (
            flagged.groupBy("checksum")
            .agg(
                *[F.any_value(F.col(c)).alias(c) for c in payload],
                F.sum(
                    F.when(F.col("change") == "added", 1).otherwise(-1)
                ).alias("__net"),
            )
            .where(F.col("__net") != 0)
            .select(
                *payload,
                F.when(F.col("__net") > 0, F.lit("added"))
                .otherwise(F.lit("removed"))
                .alias("change"),
            )
        )

    def compact(
        self,
        table_id: str,
        files_per_partition: int = 1,
        full: bool = False,
    ) -> int:
        """Retrying wrapper over ``_compact_attempt`` (see its
        docstring)."""
        return self._with_commit_retry(
            lambda: self._compact_attempt(
                table_id, files_per_partition, full=full
            )
        )

    def _compact_attempt(
        self,
        table_id: str,
        files_per_partition: int = 1,
        full: bool = False,
    ) -> int:
        """Rewrite fragmented storage into a bounded file count — the
        small-file maintenance op (Delta OPTIMIZE analog). Incremental
        merges accumulate one-or-more files per write; after many
        writes a snapshot read opens hundreds of tiny parquet files,
        and at cluster scale the task-per-file floor dominates.

        Month-partitioned manifest tables compact PARTIALLY by
        default: the manifest already knows each month's file count,
        so only months holding more than one file are read and
        rewritten — every already-compact month is carried forward by
        reference, making the op O(fragmented months), the same
        pruning discipline as the merge itself (``full=True`` forces
        the old whole-table rewrite). A table with nothing fragmented
        is a NO-OP: no version bump, no write. Under
        ``max_records_per_file`` the convergence target per month is
        the knob-achievable ``ceil(rows / N)`` (row counts from the
        parquet footers), not 1 — and a month is also fragmented
        whenever any single file exceeds the knob (files written
        before the knob was set or lowered), so the size cap is
        enforced retroactively. The flat layout always rewrites, to
        ``files_per_partition`` files total — or more when the
        file-size knob splits them (the knob wins; it exists to cap
        file size).

        Logical content is untouched (every snapshot at every
        ``slice_ts`` is bit-identical before and after — the rewrite
        is a pure physical re-layout written as a NEW immutable
        version, so readers of the old version are never disturbed
        and a crash mid-compact changes nothing).
        Returns the number of data files in the current version after
        the op.
        """
        if files_per_partition <= 0:
            raise ValueError("files_per_partition must be positive")
        base = self._current_version(table_id)
        manifest = self._manifest_of(table_id, base) if base else None
        if (
            self.partition_granularity == "month"
            and not full
            and manifest is not None
            and "months" in manifest
        ):
            months = manifest["months"]
            tdir = self._table_dir(table_id)
            cached_rows: dict = manifest.get("file_rows") or {}

            def vc_of(ref: str) -> str | None:
                # the transaction-cluster value of a ref's path
                # (``__vc=c`` / ``__vc=o``), None for pre-round-11 refs
                for comp in ref.split("/"):
                    if comp.startswith(f"{TXN_CLUSTER_COL}="):
                        return comp
                return None

            def groups_of(fs: list[str]) -> dict[str | None, list[str]]:
                out: dict[str | None, list[str]] = {}
                for f in fs:
                    out.setdefault(vc_of(f), []).append(f)
                return out

            def is_fragmented(fs: list[str]) -> bool:
                # Fragmentation is judged PER transaction-cluster
                # group: a rewrite deterministically emits one file
                # per (month, __vc) present, so a month holding one
                # closed-rows file and one open-rows file is the
                # converged state, not fragmentation. A month mixing
                # pre-cluster (no __vc) refs with anything else gets
                # one migration rewrite.
                groups = groups_of(fs)
                if None in groups and len(fs) > 1:
                    return True
                # Knobless: fragmented iff any group has more than one
                # file — no footer reads, so the common all-compact
                # sweep stays metadata-only.
                if self.max_records_per_file is None:
                    return any(len(g) > 1 for g in groups.values())
                # With the file-size knob set, row counts come from
                # the manifest's write-time cache (ADVICE r9 — the
                # all-compact sweep stays metadata-only for knob-set
                # stores too); parquet footers only for files written
                # before the cache existed, and on any footer failure
                # fall back to the knobless rule.
                try:
                    counts = {
                        f: cached_rows[f]
                        if f in cached_rows
                        else pq.ParquetFile(
                            os.path.join(tdir, f)
                        ).metadata.num_rows
                        for f in fs
                    }
                except Exception:
                    return any(len(g) > 1 for g in groups.values())
                # Any single file over the cap is fragmentation even
                # when the file COUNT already equals the achievable
                # target (e.g. files [N+5, 1], or files written before
                # the knob was set/lowered) — the size cap is enforced
                # retroactively, not just the count.
                if any(c > self.max_records_per_file for c in counts.values()):
                    return True
                # A rewrite cannot beat ceil(rows / max_records_per_file)
                # files per cluster group, so that — not 1 — is the
                # convergence target (otherwise a periodic compact()
                # would rewrite every large month forever, bumping a
                # version each call instead of reaching the documented
                # no-op).
                return any(
                    len(g)
                    > max(
                        1,
                        -(
                            -sum(counts[f] for f in g)
                            // self.max_records_per_file
                        ),
                    )
                    for g in groups.values()
                )

            frag = sorted(
                m for m, fs in months.items() if is_fragmented(fs)
            )
            if not frag:
                return sum(len(fs) for fs in months.values())
            files = [
                os.path.join(tdir, f) for m in frag for f in months[m]
            ]
            rows = self.spark.read.parquet(*files)
            self._write_version(
                rows, table_id, changed_months=frag, base_version=base
            )
        elif self.partition_granularity == "month":
            current = self.read_raw(table_id, version=base)
            # every month changed -> fresh manifest, full rewrite
            self._write_version(
                current, table_id, changed_months=None, base_version=base
            )
        else:
            current = self.read_raw(table_id, version=base)
            self._write_version(
                current.coalesce(files_per_partition),
                table_id,
                changed_months=None,
                base_version=base,
            )
        new_version = (base or 0) + 1
        files = self._version_files(table_id, new_version)
        if files is not None:
            return len(files)
        n = 0  # legacy layout fallback
        for root, _dirs, names in os.walk(
            self._version_dir(table_id, new_version)
        ):
            n += sum(1 for f in names if f.endswith(".parquet"))
        return n

    def payload_columns(self, table_id: str) -> list[str]:
        """The table's data columns (SCD2 bookkeeping excluded)."""
        return [
            c
            for c in self.read_raw(table_id).columns
            if c not in SCD2_COLUMNS
        ]

    def evolve_schema(self, table_id: str, new_columns: dict[str, str]) -> None:
        """Retrying wrapper over ``_evolve_schema_attempt`` (see its
        docstring)."""
        return self._with_commit_retry(
            lambda: self._evolve_schema_attempt(table_id, new_columns)
        )

    def _evolve_schema_attempt(
        self, table_id: str, new_columns: dict[str, str]
    ) -> None:
        """Add NULL-backfilled columns to an existing table and
        RECOMPUTE row checksums over the widened column set — so a row
        whose new columns are NULL keeps its identity across the
        evolution (no spurious close/reopen on the next merge; the
        NULL-distinguishing checksum of (old cols) differs from
        (old cols + NULL), so identity only survives by rewriting).

        ``new_columns`` maps column name -> Spark SQL type string.
        This writes one new version with every month changed — the one
        deliberately unpruned rewrite in the store's lifecycle;
        subsequent merges prune partitions again. Historical (closed)
        rows are rewritten too: checksums are merge-compare identity,
        not part of any read contract, so rewriting them is safe.
        """
        bad = [c for c in new_columns if c in SCD2_COLUMNS]
        if bad:
            raise ValueError(f"cannot add SCD2 bookkeeping columns: {bad}")
        base = self._current_version(table_id)
        existing = self.read_raw(table_id, version=base)
        dupes = [c for c in new_columns if c in existing.columns]
        if dupes:
            raise ValueError(f"columns already exist: {dupes}")
        widened = existing.withColumns(
            {c: F.lit(None).cast(t) for c, t in new_columns.items()}
        )
        payload = [c for c in widened.columns if c not in SCD2_COLUMNS]
        evolved = widened.withColumn("checksum", row_checksum(payload))
        self._write_version(
            evolved, table_id, changed_months=None, base_version=base
        )

    def update_snapshot(
        self,
        data: DataFrame,
        table_id: str,
        slice_ts,
        written_range=None,
        close_absent: bool = True,
        allow_schema_evolution: bool = False,
    ) -> None:
        """Retrying wrapper over ``_update_snapshot_attempt`` (the
        full merge semantics live on its docstring): a concurrent
        writer winning the conditional-put commit makes this attempt
        raise ``CommitConflictError``; the retry re-reads the table —
        now containing the winner's rows — and re-applies THIS
        snapshot's checksum merge on top, which is exactly the
        serial-execution result (the merge is a pure function of
        (current table, incoming data, slice_ts)). One writer always
        wins each round, so the loop terminates unless writers keep
        arriving faster than merges complete."""
        return self._with_commit_retry(
            lambda: self._update_snapshot_attempt(
                data,
                table_id,
                slice_ts,
                written_range=written_range,
                close_absent=close_absent,
                allow_schema_evolution=allow_schema_evolution,
            )
        )

    def _update_snapshot_attempt(
        self,
        data: DataFrame,
        table_id: str,
        slice_ts,
        written_range=None,
        close_absent: bool = True,
        allow_schema_evolution: bool = False,
    ) -> None:
        """Checksum-merge ``data`` as the snapshot at ``slice_ts``.

        ``close_absent=False`` switches to **append-only merge**: rows
        of ``data`` not already current open at ``slice_ts``, and no
        existing row is ever closed. This is the correct mode for
        *incremental* producers — streaming micro-batches emit only
        new finalized rows (closed sessions, watermark-finalized
        windows), so "absent from this batch" carries no information;
        under the default snapshot compare each batch would close the
        previous batch's rows. Batch engine writes keep the default:
        there ``data`` IS the complete range snapshot.

        Compare-at-timestamp semantics (equivalent to
        ``SCDB::update_snapshot(..., enforce_chronological_order=FALSE)``):
        rows valid at ``slice_ts`` but absent from ``data`` are closed
        (``until_ts = slice_ts``); rows of ``data`` not already valid at
        ``slice_ts`` are opened (``from_ts = slice_ts``); matching
        checksums are untouched. Earlier/later slices are unaffected,
        giving per-``slice_ts`` snapshot isolation
        (``R/DiseasystoreBase.R:533-537`` keying).

        ``written_range=(start_date, end_date)`` (partitioned tables
        only) declares that ``data`` is a range-scoped update: it is
        the complete intended snapshot of every row whose validity
        OVERLAPS ``[start_date, end_date]`` (the engine's compute
        contract), and says nothing about rows outside the range.
        The merge then compares only range-overlapping rows of the
        month partitions at-or-before ``month(end_date)``: rows
        entirely before ``start_date`` (or after ``end_date``) are
        never closed — the reference reaches the same end state by
        re-including all current out-of-range rows into the compared
        frame (``R/DiseasystoreBase.R:195-212``) — and later months
        are carried forward untouched (referenced, never scanned).
        This is the scale contract of ``_compute_and_store_range``:
        every engine write is scoped to a date range, so a backfill
        into year 1 of a 10-year table neither rewrites the other 9
        years nor (since round 10) closes-and-rewrites the months
        before the range. If ``data`` nevertheless contains rows with
        ``month(valid_from) > month(end_date)`` (a handler violating
        the study-period clip contract), the violation is detected
        from the changed-months set and the merge transparently falls
        back to an unscoped full compare.

        ``allow_schema_evolution=True`` widens on column mismatch:
        extra incoming columns trigger ``evolve_schema`` (NULL
        backfill + identity-preserving checksum rewrite of the stored
        table) and columns the incoming frame lacks are NULL-filled
        into it — so old- and new-schema producers interleave safely.
        Without the flag a mismatch raises (it previously dropped
        extra columns silently).
        """
        ts = normalize_slice_ts(slice_ts)
        bad = [c for c in data.columns if c in SCD2_COLUMNS]
        if bad:
            raise ValueError(f"incoming data must not contain SCD2 columns: {bad}")

        # Capture the base version ONCE per attempt: every read below
        # and the final commit use this same version, so an interleaved
        # competitor commit makes our conditional put (base+1) fail and
        # re-enters the retry loop — never a lost update.
        base = self._current_version(table_id)
        if base is not None:
            existing_payload = set(self._payload_columns_at(table_id, base))
            incoming_cols = set(data.columns)
            if existing_payload != incoming_cols:
                extra = sorted(incoming_cols - existing_payload)
                missing = sorted(existing_payload - incoming_cols)
                if not allow_schema_evolution:
                    # Fail loud: the previous behavior silently dropped
                    # extra incoming columns in the final select.
                    raise ValueError(
                        f"schema mismatch for {table_id}: incoming adds "
                        f"{extra or 'nothing'}, lacks {missing or 'nothing'}"
                        " — pass allow_schema_evolution=True to widen the"
                        " table (NULL backfill, identity-preserving"
                        " checksum rewrite)"
                    )
                if extra:
                    dtypes = {f.name: f.dataType for f in data.schema.fields}
                    self.evolve_schema(
                        table_id,
                        {c: dtypes[c].simpleString() for c in extra},
                    )
                    # evolve_schema committed its own version (its own
                    # optimistic loop) — rebase this attempt on it.
                    base = self._current_version(table_id)
                if missing:
                    tbl = {
                        f.name: f.dataType
                        for f in self.read_raw(
                            table_id, version=base
                        ).schema.fields
                    }
                    data = data.withColumns(
                        {c: F.lit(None).cast(tbl[c]) for c in missing}
                    )

        incoming = data.withColumn(
            "checksum", row_checksum(data.columns)
        ).dropDuplicates(["checksum"])

        if written_range is not None and self.partition_granularity != "month":
            written_range = None  # scoping is a partitioned-layout feature

        if base is None:
            new_table = incoming.withColumns(
                {
                    "from_ts": F.lit(ts).cast("timestamp"),
                    "until_ts": F.lit(None).cast("timestamp"),
                }
            )
            self._write_version(
                new_table, table_id, changed_months=None, base_version=None
            )
            return

        if not close_absent:
            self._append_only(incoming, table_id, ts, base)
            return
        self._merge_existing(incoming, table_id, ts, written_range, base)

    def _payload_columns_at(self, table_id: str, version: int) -> list[str]:
        return [
            c
            for c in self.read_raw(table_id, version=version).columns
            if c not in SCD2_COLUMNS
        ]

    def _append_only(
        self,
        incoming: DataFrame,
        table_id: str,
        ts: datetime.datetime,
        base: int,
    ) -> None:
        """Insert rows not already current at ``ts``; never close
        anything. Replay-idempotent: a re-merged batch matches on
        checksum and inserts nothing (the version bump is skipped)."""
        partitioned = self._scoped_write_ok(table_id, base)
        existing = self.read_raw(table_id, version=base)
        is_current = (F.col("from_ts") <= F.lit(ts)) & (
            F.col("until_ts").isNull() | (F.col("until_ts") > F.lit(ts))
        )
        inserted = incoming.join(
            existing.where(is_current).select("checksum"),
            "checksum",
            "left_anti",
        ).withColumns(
            {
                "from_ts": F.lit(ts).cast("timestamp"),
                "until_ts": F.lit(None).cast("timestamp"),
            }
        ).select(*existing.columns)

        if not partitioned:
            if inserted.isEmpty():
                return
            self._write_version(
                existing.unionByName(inserted),
                table_id,
                changed_months=None,
                base_version=base,
            )
            return

        # NULL valid_from lands in the NULL_MONTH segment (that is
        # literally the directory partitionBy writes it to), so the
        # changed-month key must say so too — a raw date_format would
        # yield Python None here: unsortable against the string
        # months, and a changed-months list that can never pop the
        # manifest's NULL_MONTH key (silently dropping that month's
        # carried rows).
        month_of = F.coalesce(
            F.date_format(F.col("valid_from"), "yyyy-MM"),
            F.lit(NULL_MONTH),
        )
        inserted = inserted.cache()
        try:
            changed_months = sorted(
                r["m"]
                for r in inserted.select(month_of.alias("m")).distinct().collect()
            )
            if not changed_months:
                return
            new_parts = existing.where(month_of.isin(changed_months)).unionByName(
                inserted
            )
            self._write_version(
                new_parts,
                table_id,
                changed_months=changed_months,
                base_version=base,
            )
        finally:
            inserted.unpersist()

    def _scoped_write_ok(self, table_id: str, base: int | None) -> bool:
        """Month-scoped (pruned) writes need a manifest base to carry
        unchanged months forward by reference. A legacy-layout base
        (dir marker / ``_CURRENT``) takes one unscoped full rewrite —
        the migration write — and is manifest from then on."""
        if self.partition_granularity != "month":
            return False
        if base is None:
            return True
        m = self._manifest_of(table_id, base)
        return m is not None and "months" in m

    def _merge_existing(
        self,
        incoming: DataFrame,
        table_id: str,
        ts: datetime.datetime,
        written_range,
        base: int,
    ) -> None:
        # The merge consumes ``incoming`` two-to-three times (the
        # closed/inserted anti-joins, then kept's semi-join on a real
        # change) — but ``incoming`` is usually an UPSTREAM COMPUTE
        # (the engine hands the handler's source read / generation
        # lazily), so each consumer would re-run it from scratch.
        # Cache it for the merge's lifetime: one evaluation, spill-
        # safe (MEMORY_AND_DISK), released in the finally (measured on
        # the sf10 engine backfill: SCALE.md round-10).
        incoming = incoming.cache()
        try:
            self._merge_existing_cached(
                incoming, table_id, ts, written_range, base
            )
        finally:
            incoming.unpersist()

    def _merge_existing_cached(
        self,
        incoming: DataFrame,
        table_id: str,
        ts: datetime.datetime,
        written_range,
        base: int,
    ) -> None:
        partitioned = self._scoped_write_ok(table_id, base)
        if not partitioned:
            # an unscoped compare must read the WHOLE table — a range
            # scope is only sound when untouched months carry forward
            written_range = None
        existing = self.read_raw(
            table_id,
            max_valid_from=written_range[1] if written_range else None,
            version=base,
        )
        is_current = (F.col("from_ts") <= F.lit(ts)) & (
            F.col("until_ts").isNull() | (F.col("until_ts") > F.lit(ts))
        )
        current = existing.where(is_current)
        others = existing.where(~is_current)

        close_candidates = current
        in_scope = None
        if written_range is not None:
            # Only rows whose validity OVERLAPS the declared range are
            # in the compare's scope: ``data`` is the complete snapshot
            # of range-overlapping rows (the engine compute contract),
            # so absence outside the range carries no information.
            # Rows entirely before range_start (or after range_end)
            # are NEVER closed by a scoped merge — the reference
            # reaches the same end state by re-including all current
            # out-of-range rows into the compared frame
            # (R/DiseasystoreBase.R:195-212); scoping the closure
            # keeps them out of the compare entirely, so a backfill
            # at a new slice_ts neither closes nor rewrites earlier
            # months (round-10: this was the sf10 backfill's 25 s —
            # every month <= range_end was closed + rewritten). The
            # predicate pushes to the parquet scan, so row groups of
            # old months entirely before the range are skipped by
            # min/max stats.
            in_scope = (
                F.col("valid_from") <= F.lit(written_range[1])
            ) & (
                F.col("valid_until").isNull()
                | (F.col("valid_until") > F.lit(written_range[0]))
            )
            close_candidates = current.where(in_scope)

        incoming_keys = incoming.select("checksum")
        closed = close_candidates.join(
            incoming_keys, "checksum", "left_anti"
        ).withColumn("until_ts", F.lit(ts).cast("timestamp"))
        inserted = incoming.join(
            current.select("checksum"), "checksum", "left_anti"
        ).withColumns(
            {
                "from_ts": F.lit(ts).cast("timestamp"),
                "until_ts": F.lit(None).cast("timestamp"),
            }
        )

        if not partitioned:
            kept = current.join(incoming_keys, "checksum", "left_semi")
            new_table = (
                others.unionByName(kept)
                .unionByName(closed)
                .unionByName(inserted.select(*others.columns))
            )
            self._write_version(
                new_table, table_id, changed_months=None, base_version=base
            )
            return

        # Partition-pruned merge: only months containing a closed or an
        # inserted row change; everything else is linked forward. The
        # change sets are cached so the months-collect and the write
        # run the anti-joins once.
        # Coalesce to NULL_MONTH for the same reason as the
        # append-only path: NULL-valid_from rows live in that
        # manifest segment. (NULL_MONTH sorts after every "yyyy-MM",
        # so when such rows change, the written_range guard below
        # routes the merge through the unscoped rewrite — correct,
        # just unpruned.)
        month_of = F.coalesce(
            F.date_format(F.col("valid_from"), "yyyy-MM"),
            F.lit(NULL_MONTH),
        )
        closed = closed.cache()
        inserted = inserted.cache()
        try:
            changed_months = sorted(
                r["m"]
                for r in closed.select(month_of.alias("m"))
                .union(inserted.select(month_of.alias("m")))
                .distinct()
                .collect()
            )
            if not changed_months:
                return  # merge is a no-op: current version already correct

            if written_range is not None and changed_months[-1] > written_range[
                1
            ].strftime("%Y-%m"):
                # ``data`` reached past the declared range (clip-contract
                # violation): the scoped compare would treat those months'
                # surviving rows as absent. Redo unscoped — correct for
                # any input, just without the pruning.
                # incoming is already cached by the _merge_existing
                # wrapper — re-enter the body directly, unscoped
                return self._merge_existing_cached(
                    incoming, table_id, ts, None, base
                )

            # All closed/inserted rows lie in changed months by
            # construction — reuse them; only kept/others re-read the
            # (pruned) existing partitions.
            in_changed = month_of.isin(changed_months)
            part_existing = existing.where(in_changed)
            part_current = part_existing.where(is_current)
            if in_scope is not None:
                # a changed month can also hold current rows OUTSIDE
                # the compared range (e.g. a sub-month range update):
                # they are neither closed nor checksum-matched against
                # ``data`` — carry them into the rewrite verbatim.
                part_kept = (
                    part_current.where(in_scope)
                    .join(incoming_keys, "checksum", "left_semi")
                    .unionByName(part_current.where(~in_scope))
                )
            else:
                part_kept = part_current.join(
                    incoming_keys, "checksum", "left_semi"
                )
            part_others = part_existing.where(~is_current)
            new_parts = (
                part_others.unionByName(part_kept)
                .unionByName(closed)
                .unionByName(inserted.select(*part_others.columns))
            )
            self._write_version(
                new_parts,
                table_id,
                changed_months=changed_months,
                base_version=base,
            )
        finally:
            closed.unpersist()
            inserted.unpersist()

    #: sentinel distinguishing "caller did not thread a base version"
    #: (legacy internal callers, resolved here) from an explicit None
    #: ("I observed the table absent — claim version 1").
    _BASE_UNSET = object()

    def _write_version(
        self,
        new_table: DataFrame,
        table_id: str,
        changed_months: list[str] | None,
        base_version=_BASE_UNSET,
    ) -> None:
        """Write a new immutable segment directory and commit the
        version by putting its MANIFEST marker.

        Partitioned mode with ``changed_months``: ``new_table`` holds
        only the changed months' rows; the manifest carries the
        previous version's file references forward for every other
        month — zero data I/O for unchanged months (no links, no
        copies; the Iceberg pattern). Commit cost is therefore
        O(changed months), independent of the table's total span.

        The segment name carries a per-attempt token so two writers
        racing for the same version number can never scribble into
        each other's files; the conditional-put marker commit decides
        the winner, and the loser's segment is removed before
        ``CommitConflictError`` propagates to the retry loop.

        ``base_version`` is the version the caller's merge plan was
        DERIVED from (captured once at the top of the write attempt
        and threaded through its reads); the commit always claims
        ``base_version + 1`` — the Delta/Iceberg readVersion pattern.
        Re-resolving the current version here instead would open a
        lost-update window: a competitor committing base+1 between our
        plan and our write would hand us base+2 unopposed, and our
        full-state rewrite (derived from base) would silently erase
        the competitor's rows. With the read version pinned, any
        interleaved commit makes OUR conditional put fail, which is
        exactly the retry the optimistic loop handles. The same
        pinning makes carried-forward references safe: if our put
        wins version N+1, keep-2 GC cannot have deleted version N's
        files (that would require a commit of N+2 or later to have
        already happened, which would have made our put lose)."""
        prev = (
            self._current_version(table_id)
            if base_version is self._BASE_UNSET
            else base_version
        )
        version = (prev or 0) + 1
        dirname = f"_v{version}-{uuid.uuid4().hex[:8]}"
        tdir = self._table_dir(table_id)
        out_dir = os.path.join(tdir, dirname)

        if self.partition_granularity == "month":
            # One shuffle on the partition key -> one file per month
            # instead of (upstream partitions x months) tiny files.
            # At real scale, repartition(N, col) with N sized for
            # ~128 MB files per month is the knob.
            # Sorting by valid_until (open rows last) tightens parquet
            # row-group min/max stats so the scoped merge's
            # close-candidate predicate (valid_until > range_start OR
            # NULL) skips row groups of long-closed rows.
            sort_cols = [F.col(PARTITION_COL)]
            if "valid_until" in new_table.columns:
                sort_cols.append(F.col("valid_until").asc_nulls_last())
            partitioned = new_table.withColumn(
                PARTITION_COL,
                F.date_format(F.col("valid_from"), "yyyy-MM"),
            )
            # Second partition level — the TRANSACTION axis: rows
            # already closed (until_ts set) cluster into their own
            # files (``__vc=c``) apart from the live rows (``__vc=o``),
            # so a month's ever-growing bitemporal history never
            # shares a file with its current snapshot. The write-time
            # footer pass below records each all-closed file's
            # max(until_ts) in the manifest (``until_stats``), and
            # ``get_table(slice_ts)`` drops files whose every row
            # closed at-or-before the slice BEFORE Spark ever lists
            # them — a current-slice read scans O(live rows), not
            # O(history) (round-11; the validity-axis month_stats
            # twin landed round 10). Still one shuffle on the month
            # key: each month task writes into both subdirs.
            cluster_txn = "until_ts" in partitioned.columns
            part_cols = [PARTITION_COL]
            if cluster_txn:
                partitioned = partitioned.withColumn(
                    TXN_CLUSTER_COL,
                    F.when(F.col("until_ts").isNotNull(), F.lit("c"))
                    .otherwise(F.lit("o")),
                )
                part_cols.append(TXN_CLUSTER_COL)
                # tighten until_ts row-group stats inside closed files
                sort_cols.append(F.col("until_ts").asc_nulls_last())
            partitioned = partitioned.repartition(
                PARTITION_COL
            ).sortWithinPartitions(*sort_cols)
            writer = partitioned.write.partitionBy(*part_cols).mode(
                "overwrite"
            )
            if self.max_records_per_file is not None:
                writer = writer.option(
                    "maxRecordsPerFile", str(self.max_records_per_file)
                )
            writer.parquet(out_dir)
            self._scrub_job_droppings(out_dir)
            months = self._segment_months(tdir, dirname)
            if changed_months is not None and prev is not None:
                base_manifest = self._manifest_of(table_id, prev)
                if base_manifest is None or "months" not in base_manifest:
                    # Base marker vanished (GC'd: competitors advanced
                    # 2+ versions) — our conditional put is doomed
                    # anyway; surface the retryable conflict. (A legacy
                    # base never reaches here: the merge paths fall
                    # back to a full rewrite for those.)
                    shutil.rmtree(out_dir, ignore_errors=True)
                    raise CommitConflictError(table_id, version)
                carried = dict(base_manifest["months"])
                for m in changed_months:
                    carried.pop(m, None)
                carried.update(months)
                months = carried
            body: dict = {"months": months}
        else:
            writer = new_table.write.mode("overwrite")
            if self.max_records_per_file is not None:
                # Same file-size knob as the partitioned branch — a
                # flat table is exactly the case where one coalesced
                # multi-GB file would otherwise slip through.
                writer = writer.option(
                    "maxRecordsPerFile", str(self.max_records_per_file)
                )
            writer.parquet(out_dir)
            self._scrub_job_droppings(out_dir)
            body = {
                "files": sorted(
                    f"{dirname}/{f}"
                    for f in os.listdir(out_dir)
                    if f.endswith(".parquet")
                )
            }
        manifest = {"version": version, "dir": dirname, **body}
        # Per-file row counts, cached in the manifest so later
        # compact() fragmentation checks are metadata-only (ADVICE
        # r9): carried-forward files inherit their count from the
        # base manifest (zero footer reads for unchanged months),
        # fresh files read one parquet footer each — footers this
        # version was about to read for _STATS anyway.
        known: dict[str, int] = {}
        base_stats: dict[str, dict] = {}
        base_months: dict[str, list] = {}
        base_until: dict[str, str] = {}
        base_from: dict[str, str] = {}
        if prev is not None:
            base_m = self._manifest_of(table_id, prev)
            if base_m is not None:
                known = base_m.get("file_rows") or {}
                base_stats = base_m.get("month_stats") or {}
                base_months = base_m.get("months") or {}
                base_until = base_m.get("until_stats") or {}
                base_from = base_m.get("from_stats") or {}
        file_rows: dict[str, int] | None = {}
        fresh_md: dict[str, object] = {}
        until_stats: dict[str, str] = {}
        from_stats: dict[str, str] = {}
        for r in self._manifest_refs(manifest):
            cnt = known.get(r)
            if cnt is None:
                try:
                    md = pq.ParquetFile(os.path.join(tdir, r)).metadata
                except Exception:
                    file_rows = None
                    break
                fresh_md[r] = md
                cnt = md.num_rows
                u, fr = self._txn_axis_stats(md)
                if u is not None:
                    until_stats[r] = u
                if fr is not None:
                    from_stats[r] = fr
            else:
                # carried-forward file: inherit its transaction-axis
                # stats from the base manifest, zero footer reads
                if r in base_until:
                    until_stats[r] = base_until[r]
                if r in base_from:
                    from_stats[r] = base_from[r]
            file_rows[r] = int(cnt)
        if file_rows is not None:
            manifest["file_rows"] = file_rows
            # Transaction-axis file stats (round 11): ``until_stats``
            # maps refs whose EVERY row is closed to the file's
            # max(until_ts); ``from_stats`` maps refs to min(from_ts).
            # ``get_table(slice_ts)`` drops refs proven invisible at
            # the slice (all closed at-or-before it, or all opened
            # after it) before Spark lists a single file. Absence of
            # an entry = never pruned; a file_rows failure above
            # disables both (conservative).
            if until_stats:
                manifest["until_stats"] = until_stats
            if from_stats:
                manifest["from_stats"] = from_stats
        if file_rows is not None and "months" in manifest:
            # Per-month validity stats, from the same footers the
            # row-count pass just opened: {"max_until": iso, "open":
            # bool}. A month with no open rows (NULL valid_until) and
            # max(valid_until) <= a reader's window start can be
            # pruned at the MANIFEST on overlap-clipped snapshot reads
            # (see get_table's min_valid_until) — narrow study-period
            # reads stop scanning all of history. A month is omitted
            # (= never pruned) when any footer lacks valid_until
            # statistics; carried-forward months inherit their entry
            # from the base manifest, zero footer reads.
            month_stats: dict[str, dict] = {}
            for m, fs in manifest["months"].items():
                if m == NULL_MONTH:
                    continue  # NULL-valid_from rows: never pruned
                if base_months.get(m) == fs:
                    if m in base_stats:
                        month_stats[m] = base_stats[m]
                    continue
                mx = None
                has_open = False
                ok = True
                for f in fs:
                    md = fresh_md.get(f)
                    if md is None:
                        ok = False
                        break
                    try:
                        idx = next(
                            i
                            for i in range(md.num_columns)
                            if md.schema.column(i).name == "valid_until"
                        )
                    except StopIteration:
                        ok = False
                        break
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_null_count:
                            ok = False
                            break
                        if st.null_count:
                            has_open = True
                        elif not st.has_min_max:
                            ok = False
                            break
                        else:
                            v = st.max
                            # type() is deliberate: datetime.datetime
                            # IS-A datetime.date, but its isoformat()
                            # would be rejected by date.fromisoformat
                            # at read time — a timestamp-typed
                            # valid_until must disable the stats, not
                            # poison them (ADVICE r10).
                            if type(v) is not datetime.date:
                                ok = False
                                break
                            mx = v if mx is None or v > mx else mx
                    if not ok:
                        break
                if ok and (has_open or mx is not None):
                    month_stats[m] = {
                        "max_until": mx.isoformat() if mx else None,
                        "open": has_open,
                    }
            if month_stats:
                manifest["month_stats"] = month_stats
        all_files = [
            os.path.join(tdir, r) for r in self._manifest_refs(manifest)
        ]
        if self._write_stats(
            all_files,
            os.path.join(out_dir, "_STATS.json"),
            total_rows=(
                sum(file_rows.values()) if file_rows is not None else None
            ),
        ):
            manifest["stats"] = f"{dirname}/_STATS.json"
        try:
            self._commit_version(table_id, version, manifest)
        except CommitConflictError:
            shutil.rmtree(out_dir, ignore_errors=True)
            raise

    @staticmethod
    def _scrub_job_droppings(out_dir: str) -> None:
        """Drop the job committer's ``_SUCCESS`` flag (and checksum
        sibling) right after a segment write: the manifest is the
        completeness signal here, and unreferenced droppings would
        keep dead segment directories from emptying under the
        file-level GC."""
        for name in ("_SUCCESS", "._SUCCESS.crc"):
            try:
                os.unlink(os.path.join(out_dir, name))
            except FileNotFoundError:
                pass

    @staticmethod
    def _txn_axis_stats(md) -> tuple[str | None, str | None]:
        """Transaction-axis footer stats of one fresh parquet file:
        ``(max_until_iso, min_from_iso)``.

        ``max_until_iso`` is set ONLY when every row group proves
        every row closed (``until_ts`` null_count == 0 with min/max
        present) — it licenses dropping the whole file for any
        snapshot read at ``slice_ts >= max_until``. ``min_from_iso``
        licenses dropping the file for any read at ``slice_ts <
        min_from`` (as-of reads of older slices skip files written
        later). Either is None when the footer can't prove it
        (missing column, missing statistics, INT96 timestamps, open
        rows, zero row groups)."""
        try:
            idx = next(
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == "until_ts"
            )
            fidx = next(
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == "from_ts"
            )
        except StopIteration:
            return None, None
        if md.num_row_groups == 0:
            return None, None

        def _naive_utc(v) -> datetime.datetime | None:
            if type(v) is not datetime.datetime:
                return None
            if v.tzinfo is not None:
                v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            return v

        mx: datetime.datetime | None = None
        mn: datetime.datetime | None = None
        all_closed = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if (
                st is None
                or not st.has_null_count
                or st.null_count
                or not st.has_min_max
            ):
                all_closed = False
            elif all_closed:
                v = _naive_utc(st.max)
                if v is None:
                    all_closed = False
                else:
                    mx = v if mx is None or v > mx else mx
            fst = md.row_group(rg).column(fidx).statistics
            if fst is None or not fst.has_min_max:
                mn = None
                break
            fv = _naive_utc(fst.min)
            if fv is None:
                mn = None
                break
            mn = fv if mn is None or fv < mn else mn
        return (
            mx.isoformat() if all_closed and mx is not None else None,
            mn.isoformat() if mn is not None else None,
        )

    @staticmethod
    def _segment_months(tdir: str, dirname: str) -> dict[str, list[str]]:
        """Per-month relpath listing of a freshly written partitioned
        segment: ``{"2020-01": ["_v3-ab/__vm=2020-01/part-0.parquet"],
        ...}`` (one data-plane LIST of the segment just written)."""
        out: dict[str, list[str]] = {}
        seg = os.path.join(tdir, dirname)
        for entry in sorted(os.listdir(seg)):
            if not entry.startswith(f"{PARTITION_COL}="):
                continue
            month = entry[len(PARTITION_COL) + 1:]
            # walk: months may nest a ``__vc=`` transaction-cluster
            # level below the month dir (round 11)
            mdir = os.path.join(seg, entry)
            files = sorted(
                os.path.relpath(os.path.join(root, f), tdir)
                for root, _dirs, names in os.walk(mdir)
                for f in names
                if f.endswith(".parquet")
            )
            if files:
                out[month] = files
        return out

    #: above this row count the stats aggregation runs as a Spark job
    #: instead of a driver-side DuckDB scan (the scan reads only key +
    #: validity columns, but at billions of rows even that belongs on
    #: the executors — where it is noise next to the write itself).
    _STATS_DRIVER_MAX_ROWS = 50_000_000

    def _write_stats(
        self,
        files: list[str],
        stats_path: str,
        total_rows: int | None = None,
    ) -> bool:
        """Persist table statistics next to the version's own segment
        (``_STATS.json`` — leading underscore, so parquet readers skip
        it): row count, approx distinct key tuples (``key_*``
        columns), validity span, mean row span. The analog of an
        RDBMS ANALYZE, computed at WRITE time so query-time planning
        decisions (the interlace auto-bucketing width,
        ``operators/interlace.py:width_from_stats``) cost zero extra
        jobs. ``files`` is the version's COMPLETE file list from its
        manifest — carried-forward months included. Returns True when
        stats were written (the manifest then records the path).

        Cost discipline: the row count comes FREE from the parquet
        footers (pyarrow metadata, no data read — and it covers
        carried-forward unchanged months too); the key-cardinality /
        span aggregation is a driver-side DuckDB scan of just the key
        + validity columns for ordinary tables (no Spark job, ~ms),
        escalating to a column-pruned Spark aggregation only above
        ``_STATS_DRIVER_MAX_ROWS``. Stats are advisory: any failure
        is swallowed and the readers treat the table as stats-less.
        """
        if not files:
            return False
        try:
            schema = pq.ParquetFile(files[0]).schema_arrow
            if "valid_from" not in schema.names:
                return False
            # the caller usually hands the footer-derived total down
            # (it cached per-file counts in the manifest already) —
            # only recount when it could not
            n = (
                total_rows
                if total_rows is not None
                else sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            )
        except Exception:
            return False
        if not n:
            return False
        keys = [c for c in schema.names if c.startswith("key_")]
        has_until = "valid_until" in schema.names
        try:
            if n <= self._STATS_DRIVER_MAX_ROWS:
                import duckdb

                ktuple = (
                    "approx_count_distinct(concat_ws(chr(31), "
                    + ", ".join(f'CAST("{c}" AS VARCHAR)' for c in keys)
                    + "))"
                    if keys
                    else "1"
                )
                until = (
                    'coalesce("valid_until", "valid_from")'
                    if has_until
                    else '"valid_from"'
                )
                row = duckdb.sql(
                    f"SELECT {ktuple} AS k, min(valid_from) AS lo, "
                    f"greatest(max(valid_from), max({until})) AS hi, "
                    f"avg(date_diff('day', CAST(valid_from AS DATE), "
                    f"CAST({until} AS DATE))) AS avg_span "
                    f"FROM read_parquet({files!r})"
                ).fetchone()
                k, lo, hi, avg_span = row
            else:
                df = self.spark.read.parquet(*files)
                kc = (
                    F.approx_count_distinct(
                        F.xxhash64(*[F.col(c) for c in keys])
                    )
                    if keys
                    else F.lit(1)
                )
                until = (
                    F.coalesce("valid_until", "valid_from")
                    if has_until
                    else F.col("valid_from")
                )
                r = df.agg(
                    kc.alias("k"),
                    F.min("valid_from").alias("lo"),
                    F.greatest(F.max("valid_from"), F.max(until)).alias("hi"),
                    F.avg(F.datediff(until, "valid_from")).alias("avg_span"),
                ).first()
                k, lo, hi, avg_span = r["k"], r["lo"], r["hi"], r["avg_span"]
        except Exception:
            return False
        if lo is None or hi is None:
            return False
        if hasattr(lo, "date"):
            lo, hi = lo.date(), hi.date()
        stats = {
            "n": int(n),
            "k": int(k or 1),
            "lo": str(lo),
            "hi": str(hi),
            "span_days": max((hi - lo).days, 1),
            "avg_span": float(avg_span or 0.0),
        }
        with open(stats_path, "w") as fh:
            json.dump(stats, fh)
        return True

    def table_stats(self, table_id: str) -> dict | None:
        """Read the current version's write-time statistics (see
        ``_write_stats``); None when absent (pre-stats tables). The
        stats path comes from the manifest; legacy versions fall back
        to ``<version_dir>/_STATS.json``."""
        cur = self._current_version(table_id)
        if cur is None:
            return None
        marker = self._read_marker(table_id, cur)
        if marker is not None and ("months" in marker or "files" in marker):
            rel = marker.get("stats")
            if rel is None:
                return None
            path = os.path.join(self._table_dir(table_id), rel)
        else:
            path = os.path.join(
                self._version_dir(table_id, cur), "_STATS.json"
            )
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    # --------------------------------------------------------------- logs
    # The log table is driver-side metadata: one row per completed
    # range write (cardinality ~ number of writes, never data-sized).
    # It is written and read with pyarrow directly — no Spark job, no
    # executor round-trip — which removes several seconds of fixed
    # overhead per get_feature call. The on-disk format stays plain
    # parquet, so Spark (and DuckDB) can still read it as a table.
    _LOG_ARROW_SCHEMA = pa.schema(
        [
            ("date", pa.timestamp("us")),
            ("schema", pa.string()),
            ("table", pa.string()),
            ("message", pa.string()),
            ("success", pa.bool_()),
            ("log_file", pa.string()),
        ]
    )

    def _logs_dir(self, schema: str) -> str:
        return os.path.join(self.root, schema, LOGS_TABLE)

    def append_log(
        self,
        schema: str,
        table_id: str,
        slice_ts,
        message: str,
        success: bool,
    ) -> None:
        """Append one log row per completed range write
        (``R/DiseasystoreBase.R:215-239``; schema per FIXTURES.md §6b)."""
        ts = normalize_slice_ts(slice_ts)
        log_schema, _, log_table = table_id.partition(".")
        ldir = self._logs_dir(schema)
        os.makedirs(ldir, exist_ok=True)
        table = pa.table(
            {
                "date": [ts],
                "schema": [log_schema],
                "table": [log_table],
                "message": [message],
                "success": [success],
                "log_file": [""],
            },
            schema=self._LOG_ARROW_SCHEMA,
        )
        pq.write_table(table, os.path.join(ldir, f"{uuid.uuid4().hex}.parquet"))

    def read_logs_pandas(self, schema: str) -> pd.DataFrame:
        ldir = self._logs_dir(schema)
        files = (
            [
                os.path.join(ldir, f)
                for f in os.listdir(ldir)
                if f.endswith(".parquet")
            ]
            if os.path.isdir(ldir)
            else []
        )
        if not files:
            return self._LOG_ARROW_SCHEMA.empty_table().to_pandas()
        return pa.concat_tables(pq.read_table(f) for f in files).to_pandas()

    def read_logs(self, schema: str) -> DataFrame:
        """Logs as a Spark DataFrame (for relational consumers)."""
        return self.spark.createDataFrame(
            self.read_logs_pandas(schema), _LOG_SCHEMA
        )

    def delete_logs_for(self, schema: str, table_ids: list[str]) -> None:
        """Delete log rows for the given tables (rewrite; logs are tiny).
        Mirrors the ``rows_delete`` at ``R/drop_diseasystore.R:91-97``."""
        ldir = self._logs_dir(schema)
        if not os.path.isdir(ldir):
            return
        pdf = self.read_logs_pandas(schema)
        keep = pdf[~(pdf["schema"] + "." + pdf["table"]).isin(table_ids)]
        shutil.rmtree(ldir, ignore_errors=True)
        if len(keep):
            os.makedirs(ldir, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(
                    keep, schema=self._LOG_ARROW_SCHEMA, preserve_index=False
                ),
                os.path.join(ldir, f"{uuid.uuid4().hex}.parquet"),
            )

    # -------------------------------------------------------------- locks
    def _lock_path(self, table_id: str) -> str:
        return os.path.join(
            self.root, ".locks", table_id.replace(os.sep, "_") + ".lock"
        )

    def try_lock(self, table_id: str) -> bool:
        # the advisory lock is one more conditional put — the same
        # primitive the commit uses, so it maps to any object store
        return self.commit_backend.put_if_absent(
            self._lock_path(table_id), b""
        )

    def lock(self, table_id: str, wait_increment: float, wait_max: float) -> None:
        """Advisory spin lock to avoid duplicate compute work
        (``R/DiseasystoreBase.R:145-156``). Correctness does not depend
        on it — version swaps are atomic — it only dedups effort."""
        waited = 0.0
        while not self.try_lock(table_id):
            time.sleep(wait_increment)
            waited += wait_increment
            if waited > wait_max:
                raise TimeoutError(
                    f"Lock not released within {wait_max / 60} minutes. Giving up."
                )

    def unlock(self, table_id: str) -> None:
        self.commit_backend.delete(self._lock_path(table_id))
