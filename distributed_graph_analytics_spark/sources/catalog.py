"""Iceberg-style snapshot table over parquet (metadata-layer pruning).

The north rule's input is "Iceberg tables of source-code repositories"
and its checkpoints are "to Iceberg"; this sandbox ships no Iceberg
jars, so this module models the PUBLIC Apache Iceberg table-format
semantics (the spec at iceberg.apache.org/spec) over plain parquet:

- table layout: ``<root>/data/`` holds immutable parquet data files;
  ``<root>/metadata/`` holds versioned table metadata;
- ``metadata/v<N>.metadata.json``: schema (Spark JSON form), current
  snapshot id, full snapshot log ``[(committed_at, snapshot_id), ...]``;
- one manifest per snapshot (``metadata/snap-<id>.json``): the
  snapshot's complete data-file list, each entry carrying row count
  and per-column lower/upper bounds harvested from the parquet footer
  (pyarrow) — Iceberg's manifest-entry ``lower_bounds``/
  ``upper_bounds``;
- commits are atomic and snapshots immutable: data files and the
  manifest are written first, then ``metadata/version-hint.text`` is
  flipped last via ``os.replace`` — a torn commit is never the current
  version (the same marker-last discipline as
  ``plans/checkpoint.py::save`` and the reference's ``_COMPLETE``
  marker, LouvainRunner.java:67-71);
- reads select a snapshot (current, by id, or as-of a timestamp — time
  travel) and prune the file list AT THE METADATA LAYER with
  conjunctive column predicates before Spark ever plans a scan: a
  predicate can only eliminate a file whose recorded bounds exclude
  it, so pruning is always sound and never changes results — exactly
  Iceberg's scan planning, and strictly more than Catalyst can do over
  a bare ``spark.read.parquet(dir)`` (which must list + footer-read
  every file on the executors).

``mode="append"`` adds files to the previous snapshot's list;
``mode="overwrite"`` starts a fresh list. ``read_incremental`` is the
incremental append scan (files added between two snapshots — the
streaming-pipeline tail read); ``compact`` is rewrite_data_files-style
small-file compaction; ``expire_snapshots`` truncates the log and
deletes orphaned data files; commits may ADD columns (additive schema
evolution — the table schema records them nullable so pre-evolution
files read back with nulls). Grouping the write by
``cluster_by`` columns (``df.repartition(*cluster_by)``) gives each
file a tight bound on those columns, which is what makes the
metadata pruning selective — Iceberg's partition tuple generalized to
bounds (a file may hold several values; the prune stays correct,
just less sharp, if it does).

At 100 TB this module IS the control plane a real deployment swaps
for the Iceberg catalog: the manifest scan is O(files) driver-side
JSON (Iceberg itself distributes manifest reading only past ~10^6
files), and the data plane stays ``spark.read.parquet(<pruned>)``.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

try:  # pyarrow is baked into the sandbox; guard anyway (import-try rule)
    import pyarrow.parquet as _pq
except ImportError:  # pragma: no cover
    _pq = None

#: predicate operators the manifest pruner understands (conjunctive)
_OPS = ("=", "<", "<=", ">", ">=")


class SnapshotTable:
    """One Iceberg-style table rooted at a local/posix directory."""

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------------
    # commit path
    # ------------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        cluster_by: tuple[str, ...] = (),
        num_files: int | None = None,
    ) -> int:
        """Write ``df`` as a new immutable snapshot; returns snapshot id.

        ``cluster_by`` repartitions by the named columns before writing
        so per-file bounds on them are tight (the pruning columns).
        ``num_files`` sizes that write (default: the session's shuffle
        partitions); it is passed explicitly so AQE's partition
        coalescing cannot merge the clustered files back into one —
        an explicit user repartition count is exempt from coalescing.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

        prev = self._current_metadata()
        table_schema = df.schema
        if prev is not None:
            prev_schema = StructType.fromJson(prev["schema"])
            if prev_schema != df.schema:
                if not _is_additive(prev_schema, df.schema):
                    raise ValueError(
                        f"schema change on commit to {self.root}: table has "
                        f"{prev_schema.simpleString()}, commit has "
                        f"{df.schema.simpleString()}; only additive "
                        "evolution (new columns) is supported"
                    )
                table_schema = _evolved_schema(prev_schema, df.schema)

        if cluster_by:
            nf = num_files or int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
            out = df.repartition(nf, *cluster_by)
        elif num_files:
            out = df.repartition(num_files)
        else:
            out = df
        # one staging dir per commit; its parquet files are the
        # snapshot's data files, moved (not rewritten) into data/
        staging = os.path.join(self.root, f"_staging_{uuid.uuid4().hex}")
        out.write.mode("overwrite").parquet(staging)
        entries = []
        for fn in sorted(os.listdir(staging)):
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(staging, fn)
            dst_name = f"{uuid.uuid4().hex}.parquet"
            os.replace(src, os.path.join(self.data_dir, dst_name))
            entries.append(self._file_entry(dst_name, df.schema))
        _rmtree(staging)

        # random 48-bit id (Iceberg snapshot ids are random longs);
        # ordering/time-travel rides the snapshot log, not the id
        snapshot_id = uuid.uuid4().int >> 80
        files = entries
        if mode == "append" and prev is not None:
            files = self._manifest(prev["current_snapshot_id"])["files"] + entries
        manifest = {
            "snapshot_id": snapshot_id,
            "operation": mode,
            "committed_at": time.time(),
            "files": files,
            # pruning-selectivity observability: a file with no
            # harvested bounds is never pruned (sound but silent) —
            # surface the count so degraded metadata-layer pruning is
            # visible instead of just slow
            "files_without_bounds": sum(1 for e in files if not e["bounds"]),
        }
        with open(self._manifest_path(snapshot_id), "w") as f:
            json.dump(manifest, f, indent=1)

        version = (prev["version"] + 1) if prev else 1
        log = (list(prev["snapshot_log"]) if prev else []) + [
            {"committed_at": manifest["committed_at"], "snapshot_id": snapshot_id}
        ]
        meta = {
            "version": version,
            "schema": table_schema.jsonValue(),
            "current_snapshot_id": snapshot_id,
            "snapshot_log": log,
            "cluster_by": list(cluster_by),
        }
        with open(os.path.join(self.meta_dir, f"v{version}.metadata.json"), "w") as f:
            json.dump(meta, f, indent=1)
        # atomic flip LAST: readers resolve the table through this hint,
        # so a commit that dies before this line is invisible
        hint_tmp = os.path.join(self.meta_dir, f"_hint_{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, os.path.join(self.meta_dir, "version-hint.text"))
        return snapshot_id

    def _file_entry(self, name: str, schema: StructType) -> dict:
        """Manifest entry: rows + per-column bounds from the footer."""
        path = os.path.join(self.data_dir, name)
        entry: dict = {"path": name, "rows": 0, "bounds": {}}
        if _pq is None:  # pragma: no cover
            return entry
        md = _pq.ParquetFile(path).metadata
        entry["rows"] = md.num_rows
        bounds: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                name_c = col.path_in_schema
                if "." in name_c:  # nested: not prunable here
                    continue
                lo, hi = _plain(st.min), _plain(st.max)
                if lo is None or hi is None:
                    continue
                cur = bounds.get(name_c)
                if cur is None:
                    bounds[name_c] = [lo, hi]
                else:
                    cur[0] = min(cur[0], lo)
                    cur[1] = max(cur[1], hi)
        entry["bounds"] = bounds
        return entry

    # ------------------------------------------------------------------
    # read path
    # ------------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        as_of: float | None = None,
        filters: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """Scan a snapshot with metadata-layer file pruning.

        ``filters`` is a conjunctive list of ``(column, op, literal)``
        with op in ``= < <= > >=``; files whose recorded bounds exclude
        the predicate are dropped before Spark plans the scan. The same
        filters are ALSO applied as a DataFrame ``where`` (bounds prune
        files, they don't filter rows inside surviving files).
        """
        meta = self._current_metadata()
        if meta is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        sid = self._resolve_snapshot(meta, snapshot_id, as_of)
        manifest = self._manifest(sid)
        files = manifest["files"]
        kept = [e for e in files if _survives(e, filters or [])]
        schema = StructType.fromJson(meta["schema"])
        if not kept:
            df = spark.createDataFrame([], schema)
        else:
            paths = [os.path.join(self.data_dir, e["path"]) for e in kept]
            df = spark.read.schema(schema).parquet(*paths)
        from pyspark.sql import functions as F

        for col, op, val in filters or []:
            c, v = F.col(col), F.lit(val)
            df = df.where(
                {"=": c == v, "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]
            )
        return df

    def scan_files(
        self,
        snapshot_id: int | None = None,
        filters: list[tuple[str, str, object]] | None = None,
    ) -> tuple[int, int]:
        """(kept, total) manifest entries for a hypothetical scan —
        the pruning observability hook tests and ops dashboards use."""
        meta = self._current_metadata()
        if meta is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        manifest = self._manifest(self._resolve_snapshot(meta, snapshot_id, None))
        files = manifest["files"]
        return sum(_survives(e, filters or []) for e in files), len(files)

    def snapshots(self) -> list[dict]:
        """Snapshot log (oldest first): committed_at + snapshot_id."""
        meta = self._current_metadata()
        return list(meta["snapshot_log"]) if meta else []

    def read_incremental(
        self,
        spark: SparkSession,
        from_snapshot: int,
        to_snapshot: int | None = None,
        filters: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """Rows appended strictly AFTER ``from_snapshot``, up to and
        including ``to_snapshot`` (default: current) — Iceberg's
        incremental append scan, the consumption pattern of a streaming
        training-data pipeline tailing the table ("give me what landed
        since my last checkpoint").

        Data files are immutable and appends only ADD manifest entries,
        so the increment is exactly the file-set difference of the two
        manifests — an O(files) driver-side set op, no data read until
        Spark scans the surviving files. If any snapshot in the range
        is an overwrite (its file list does not contain its parent's),
        the increment is not expressible as appended files and this
        raises ``ValueError`` — the same refusal Iceberg's
        ``incremental read`` makes on REPLACE/OVERWRITE history.

        ``filters`` prune the added files at the metadata layer and
        re-apply as a row filter, exactly like ``read``.
        """
        meta = self._current_metadata()
        if meta is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        log = [s["snapshot_id"] for s in meta["snapshot_log"]]
        to_snapshot = (
            meta["current_snapshot_id"] if to_snapshot is None else to_snapshot
        )
        for sid in (from_snapshot, to_snapshot):
            if sid not in log:
                raise ValueError(f"unknown snapshot {sid}")
        i_from, i_to = log.index(from_snapshot), log.index(to_snapshot)
        if i_from > i_to:
            raise ValueError(
                f"from_snapshot {from_snapshot} is newer than "
                f"to_snapshot {to_snapshot}"
            )
        prev_paths = {e["path"] for e in self._manifest(from_snapshot)["files"]}
        added: list[dict] = []
        for sid in log[i_from + 1 : i_to + 1]:
            files = self._manifest(sid)["files"]
            paths = {e["path"] for e in files}
            if not paths >= prev_paths:
                raise ValueError(
                    f"snapshot {sid} overwrites history; incremental "
                    "read is only defined over append commits"
                )
            added.extend(e for e in files if e["path"] not in prev_paths)
            prev_paths = paths
        kept = [e for e in added if _survives(e, filters or [])]
        schema = StructType.fromJson(meta["schema"])
        if not kept:
            df = spark.createDataFrame([], schema)
        else:
            df = spark.read.schema(schema).parquet(
                *[os.path.join(self.data_dir, e["path"]) for e in kept]
            )
        from pyspark.sql import functions as F

        for col, op, val in filters or []:
            c, v = F.col(col), F.lit(val)
            df = df.where(
                {"=": c == v, "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]
            )
        return df

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def compact(self, spark: SparkSession, target_files: int) -> int:
        """Rewrite the current snapshot's data into ``target_files``
        files — Iceberg's ``rewrite_data_files`` small-file compaction,
        committed as a new overwrite snapshot (same rows, fresh file
        list; incremental readers correctly refuse to cross it). The
        table's ``cluster_by`` layout is preserved so metadata pruning
        stays selective after compaction."""
        meta = self._current_metadata()
        if meta is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        cluster_by = tuple(meta.get("cluster_by") or ())
        return self.commit(
            self.read(spark),
            mode="overwrite",
            cluster_by=cluster_by,
            num_files=target_files,
        )

    def expire_snapshots(self, keep_last: int = 1) -> tuple[int, int]:
        """Drop all but the newest ``keep_last`` snapshots: their
        manifests are deleted, data files referenced ONLY by expired
        snapshots are deleted, and a new metadata version records the
        truncated log (so the expiry itself is an atomic, crash-safe
        commit). Time travel to an expired snapshot then fails, exactly
        like Iceberg's ``expire_snapshots``. Returns
        ``(snapshots_expired, data_files_deleted)``."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        meta = self._current_metadata()
        if meta is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        log = meta["snapshot_log"]
        if len(log) <= keep_last:
            return (0, 0)
        expired = log[:-keep_last]
        kept = log[-keep_last:]
        live_paths = {
            e["path"]
            for s in kept
            for e in self._manifest(s["snapshot_id"])["files"]
        }
        dead_paths = {
            e["path"]
            for s in expired
            for e in self._manifest(s["snapshot_id"])["files"]
        } - live_paths
        # commit the truncated log FIRST (atomic flip), then clean up:
        # a crash mid-delete leaves only unreferenced orphans behind
        version = meta["version"] + 1
        new_meta = dict(meta, version=version, snapshot_log=kept)
        with open(
            os.path.join(self.meta_dir, f"v{version}.metadata.json"), "w"
        ) as f:
            json.dump(new_meta, f, indent=1)
        hint_tmp = os.path.join(self.meta_dir, f"_hint_{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, os.path.join(self.meta_dir, "version-hint.text"))
        for s in expired:
            try:
                os.remove(self._manifest_path(s["snapshot_id"]))
            except FileNotFoundError:  # pragma: no cover
                pass
        for p in dead_paths:
            try:
                os.remove(os.path.join(self.data_dir, p))
            except FileNotFoundError:  # pragma: no cover
                pass
        return (len(expired), len(dead_paths))

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{snapshot_id}.json")

    def _manifest(self, snapshot_id: int) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    def _current_metadata(self) -> dict | None:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            return None
        with open(hint) as f:
            version = int(f.read().strip())
        with open(os.path.join(self.meta_dir, f"v{version}.metadata.json")) as f:
            return json.load(f)

    @staticmethod
    def _resolve_snapshot(
        meta: dict, snapshot_id: int | None, as_of: float | None
    ) -> int:
        if snapshot_id is not None and as_of is not None:
            raise ValueError("pass snapshot_id OR as_of, not both")
        if snapshot_id is not None:
            known = {s["snapshot_id"] for s in meta["snapshot_log"]}
            if snapshot_id not in known:
                raise ValueError(f"unknown snapshot {snapshot_id}")
            return snapshot_id
        if as_of is not None:
            eligible = [
                s for s in meta["snapshot_log"] if s["committed_at"] <= as_of
            ]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of}")
            return eligible[-1]["snapshot_id"]
        return meta["current_snapshot_id"]


def _is_additive(old: StructType, new: StructType) -> bool:
    """True when ``new`` only ADDS columns to ``old`` (by-name match;
    parquet reads resolve columns by name, so position is free).
    Iceberg's safe subset of schema evolution: the TABLE schema records
    added columns as optional (see _evolved_schema), so existing files
    read under it yield nulls for them — no rewrite."""
    old_fields = {f.name: f.dataType for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    if set(old_fields) - set(new_fields):
        return False  # a drop/rename is not additive
    return all(
        new_fields[name].dataType == dt  # type change requires a rewrite
        for name, dt in old_fields.items()
    )


def _evolved_schema(old: StructType, new: StructType) -> StructType:
    """Table schema after an additive commit: the commit's schema with
    every ADDED field forced nullable — files from before the evolution
    have no values for it (Iceberg: new columns are always optional) —
    and previously-nullable fields kept nullable (a stricter writer
    cannot retro-tighten the table's contract)."""
    old_nullable = {f.name: f.nullable for f in old.fields}
    fields = []
    for f in new.fields:
        nullable = f.nullable or old_nullable.get(f.name, True)
        if nullable != f.nullable:
            f = type(f)(f.name, f.dataType, nullable=True, metadata=f.metadata)
        fields.append(f)
    return StructType(fields)


def _survives(entry: dict, filters: list[tuple[str, str, object]]) -> bool:
    """Can this file contain a row matching every predicate? Missing
    bounds for a column ⇒ unknown ⇒ keep (pruning stays sound)."""
    for col, op, val in filters:
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r} (use one of {_OPS})")
        b = entry.get("bounds", {}).get(col)
        if b is None:
            continue
        lo, hi = b
        try:
            if op == "=" and not (lo <= val <= hi):
                return False
            if op == "<" and not (lo < val):
                return False
            if op == "<=" and not (lo <= val):
                return False
            if op == ">" and not (hi > val):
                return False
            if op == ">=" and not (hi >= val):
                return False
        except TypeError:  # cross-type compare: unknown ⇒ keep
            continue
    return True


def _plain(v):
    """Footer stat → JSON-able python scalar (bytes decode as UTF-8;
    undecodable/exotic types are dropped → the column isn't pruned)."""
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str, bool)):
        return v
    return None


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
