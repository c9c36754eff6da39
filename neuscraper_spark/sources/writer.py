"""Iceberg-style table writer with per-partition lineage + resumability.

The north rule (BASELINE.json:14) requires reading/writing Iceberg
tables, checkpointing per-partition lineage and metrics so a run is
resumable mid-corpus (the batch twin of the reference's
checkpoint-resume training loop, src/scraper/trainer.py:106-189). No
Iceberg runtime jar ships in this sandbox, so the layout is
parquet-files + an owned manifest directory with the same properties an
Iceberg catalog would provide (atomic visibility via manifest commit,
partition-level stats, snapshot history); `TableWriter` is the single
seam where a real Iceberg catalog drops in (`writeTo(...).append()`).

Layout for table root T:
    T/data/<partition_key>=<value>/part-*.parquet     (hive-style dirs)
    T/_manifests/partition=<value>.json               (committed units)
    T/_snapshots/snap-<n>.json                        (run-level summary)
    T/_schema.json                                    (table schema)

Resume protocol: a partition directory is visible iff its manifest
exists; resume filters the input to partitions without a manifest, so a
killed job re-processes only incomplete partitions and reruns converge
to identical tables (writes are deterministic functions of the
partition's input rows).

Single-execution contract: `write` runs the upstream plan EXACTLY once
(the parquet write). Per-partition row counts come from the parquet
footers of the files just written — metadata reads, no second pass —
so the manifests describe the bytes actually on disk rather than a
separate (and possibly divergent) recomputation. An earlier draft ran a
groupBy().count().collect() before the write, executing the entire
neural pipeline twice per job.

Manifest/footer bookkeeping is driver-side filesystem I/O (os +
pyarrow); on a real cluster this seam is exactly what an Iceberg/Delta
catalog replaces with its own commit protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# hive's directory name for a NULL partition value — reusing it makes the
# manifest key match the directory the row actually lands in
NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _file_column_stats(fmeta) -> dict:
    """Per-column {min, max, has_null} from a parquet footer's row-group
    statistics (metadata-only — the same bytes Iceberg's manifests carry
    for file skipping). Only JSON-safe scalar types are kept; columns
    without usable stats are simply absent, which readers must treat as
    'cannot prune'. Parquet string bounds may be truncated by writers —
    truncation preserves bound validity (min stays <=, max stays >=)."""
    out: dict[str, dict] = {}
    for rg in range(fmeta.num_row_groups):
        row_group = fmeta.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                out[col.path_in_schema] = None  # unusable for pruning
                continue
            mn, mx = st.min, st.max
            if not all(isinstance(v, (int, float, str, bool)) for v in (mn, mx)):
                out[col.path_in_schema] = None
                continue
            prev = out.get(col.path_in_schema)
            if prev is None and col.path_in_schema in out:
                continue  # an earlier row group already disqualified it
            nulls = bool(st.null_count) if st.has_null_count else True
            if prev is None:
                out[col.path_in_schema] = {"min": mn, "max": mx,
                                           "has_null": nulls}
            else:
                prev["min"] = min(prev["min"], mn)
                prev["max"] = max(prev["max"], mx)
                prev["has_null"] = prev["has_null"] or nulls
    return {k: v for k, v in out.items() if v is not None}


def _bloom_positions(value, n_bits: int, k: int) -> list[int]:
    """k bit positions via Kirsch-Mitzenmacher double hashing over
    blake2b(value) — platform/run-stable (no Python hash randomization),
    shared by the builder and the prober."""
    import hashlib

    h = hashlib.blake2b(str(value).encode("utf-8"), digest_size=16).digest()
    a = int.from_bytes(h[:8], "little")
    b = int.from_bytes(h[8:], "little") | 1
    return [(a + i * b) % n_bits for i in range(k)]


def _ranges_from_stats(manifest: dict, cols: list[str]) -> dict | None:
    """{col: (min, max)} for a Z-order rewrite, derived from the
    partition manifest's per-file footer stats — the same numbers a
    fresh stats scan would produce, for free. Returns None (caller
    falls back to scanning) when any file lacks numeric stats for any
    requested column."""
    per: dict[str, list] = {c: [] for c in cols}
    for frec in manifest.get("lineage", {}).get("files", []):
        st = frec.get("stats") or {}
        for c in cols:
            s = st.get(c)
            if (
                s is None
                or not isinstance(s.get("min"), (int, float))
                or isinstance(s.get("min"), bool)
                or not isinstance(s.get("max"), (int, float))
            ):
                return None
            per[c].append((s["min"], s["max"]))
    if not all(per[c] for c in cols):
        return None
    return {
        c: (min(lo for lo, _ in v), max(hi for _, hi in v))
        for c, v in per.items()
    }


@dataclass
class TableWriter:
    root: str
    partition_col: str

    @property
    def data_dir(self) -> str:
        return os.path.join(self.root, "data")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    @property
    def snapshot_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    @property
    def schema_path(self) -> str:
        return os.path.join(self.root, "_schema.json")

    # ------------------------------------------------------------ schema log

    def _load_schema_registry(self) -> dict | None:
        """Versioned schema log (Iceberg's schemas list + current-schema-id).
        Format 1 tables (a bare StructType json from before evolution
        support) load as a single-schema registry with id 0."""
        if not os.path.exists(self.schema_path):
            return None
        with open(self.schema_path) as f:
            raw = json.load(f)
        if "schemas" not in raw:
            return {
                "format": 2,
                "current_id": 0,
                "schemas": [{"id": 0, "schema": raw, "defaults": {}}],
            }
        return raw

    def _save_schema_registry(self, reg: dict) -> None:
        tmp = self.schema_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(reg, f)
        os.replace(tmp, self.schema_path)

    def schema_as_of(self, schema_id: int | None = None) -> StructType | None:
        """The table schema at ``schema_id`` (default: current)."""
        reg = self._load_schema_registry()
        if reg is None:
            return None
        sid = reg["current_id"] if schema_id is None else schema_id
        for s in reg["schemas"]:
            if s["id"] == sid:
                return StructType.fromJson(s["schema"])
        raise ValueError(f"unknown schema_id {sid}; have "
                         f"{[s['id'] for s in reg['schemas']]}")

    def _evolve_registry(self, reg: dict | None, df_schema: StructType,
                         mode: str, evolve: bool, defaults: dict | None) -> dict:
        """Reconcile the incoming DataFrame schema with the stored log.

        Add-column-with-default is the one evolution supported (Iceberg's
        most common): the new write's schema must contain every stored
        column at its stored type; extra columns append a new schema
        generation whose ``defaults`` give pre-existing rows their value
        (Iceberg v3 initial-default). Dropping or re-typing a column
        raises — those rewrite data, which is an ``overwrite``."""
        df_json = json.loads(df_schema.json())
        if reg is None or mode == "overwrite":
            # fresh table (overwrite expired all manifests/snapshots, so
            # schema ids restart with nothing left to reference them)
            if defaults:
                raise ValueError("defaults only apply when evolving an "
                                 "existing table's schema")
            return {"format": 2, "current_id": 0,
                    "schemas": [{"id": 0, "schema": df_json, "defaults": {}}]}
        stored = self.schema_as_of(reg["current_id"])
        stored_by_name = {f.name: f for f in stored.fields}
        df_by_name = {f.name: f for f in df_schema.fields}
        missing = [n for n in stored_by_name if n not in df_by_name]
        retyped = [
            n for n, f in df_by_name.items()
            if n in stored_by_name and stored_by_name[n].dataType != f.dataType
        ]
        if missing or retyped:
            raise ValueError(
                f"incompatible append schema: missing={missing} "
                f"retyped={retyped} — only add-column evolution is "
                f"supported; use mode='overwrite' to replace the table"
            )
        new_fields = [f for f in df_schema.fields if f.name not in stored_by_name]
        if not new_fields:
            if defaults:
                raise ValueError(f"defaults given for columns that are not "
                                 f"new: {sorted(defaults)}")
            return reg
        if not evolve:
            raise ValueError(
                f"append adds columns {[f.name for f in new_fields]} to the "
                f"stored schema; pass evolve=True to commit the evolution"
            )
        defaults = dict(defaults or {})
        unknown = set(defaults) - {f.name for f in new_fields}
        if unknown:
            raise ValueError(f"defaults for non-new columns: {sorted(unknown)}")
        # added columns must be nullable: pre-evolution files simply lack
        # them, and a null default is the base case
        evolved = StructType(
            stored.fields
            + [type(f)(f.name, f.dataType, True) for f in new_fields]
        )
        new_id = reg["current_id"] + 1
        reg = dict(reg)
        reg["schemas"] = reg["schemas"] + [{
            "id": new_id,
            "schema": json.loads(evolved.json()),
            "defaults": {f.name: defaults.get(f.name) for f in new_fields},
        }]
        reg["current_id"] = new_id
        return reg

    # ------------------------------------------------------------- manifests

    def committed_partitions(self) -> set[str]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("partition=") and name.endswith(".json"):
                out.add(urllib.parse.unquote(name[len("partition=") : -len(".json")]))
        return out

    def _manifest_path(self, value: str) -> str:
        # percent-escape symmetric with Spark's hive dir escaping (and the
        # unquote in _data_partitions): a partition value containing '/'
        # or other path-hostile characters must not change the manifest
        # directory layout or desynchronize resume from the data dirs
        return os.path.join(
            self.manifest_dir,
            f"partition={urllib.parse.quote(value, safe='')}.json",
        )

    def _pstr(self) -> F.Column:
        """Partition value as the string used in manifests — NULL-safe:
        ~isin(done) on a raw column evaluates to NULL for NULL rows and
        silently drops them from every write; coalescing to the hive
        default-partition name keeps them in the resume protocol."""
        return F.coalesce(F.col(self.partition_col).cast("string"), F.lit(NULL_PARTITION))

    def _data_partitions(self) -> dict[str, str]:
        """{manifest partition value: directory path} for every hive dir
        under data/ (dir names are percent-escaped by the writer)."""
        prefix = f"{self.partition_col}="
        out = {}
        if os.path.isdir(self.data_dir):
            for name in os.listdir(self.data_dir):
                if name.startswith(prefix) and os.path.isdir(os.path.join(self.data_dir, name)):
                    out[urllib.parse.unquote(name[len(prefix):])] = os.path.join(
                        self.data_dir, name
                    )
        return out

    # ---------------------------------------------------------------- write

    def write(self, df: DataFrame, mode: str = "resume",
              evolve: bool = False, defaults: dict | None = None,
              expectations: dict | None = None) -> dict:
        """Write df partitioned by partition_col with per-partition
        manifests. mode: 'resume' skips committed partitions (idempotent
        restart); 'overwrite' recommits everything.

        ``evolve=True`` permits add-column schema evolution on append:
        extra columns in ``df`` (vs the stored schema) commit a new
        schema generation, with ``defaults`` (scalar per new column)
        applied when reading pre-evolution partitions — Iceberg v3's
        initial-default. Without the flag a widened append raises, so
        evolution is always an explicit act.

        ``expectations`` (operators.expectations rules) turns the write
        into WRITE-AUDIT-PUBLISH: the data lands as usual, the audit
        reads back the just-written (still uncommitted, hence
        invisible) bytes in one aggregation pass, and ONLY a clean
        audit commits the manifests. On violation ExpectationError is
        raised with the report, the new partitions stay invisible to
        every read, and the next resume-mode write rewrites them —
        a bad batch can never be published. The report (pass or fail)
        is saved under ``_audits/``.

        Returns the snapshot dict (written to _snapshots too).
        """
        self._finish_compaction()  # roll forward an interrupted compact()
        self._finish_merge()  # roll forward a crashed merge_into
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.snapshot_dir, exist_ok=True)
        pcol = self.partition_col

        # reconcile the incoming schema with the stored log BEFORE any
        # destructive step, so an incompatible append cannot half-run
        reg = self._evolve_registry(
            self._load_schema_registry(), df.schema, mode, evolve, defaults
        )
        schema_id = reg["current_id"]

        done = self.committed_partitions() if mode == "resume" else set()
        if mode == "overwrite" and os.path.isdir(self.data_dir):
            shutil.rmtree(self.data_dir)
            for name in list(os.listdir(self.manifest_dir)):
                os.unlink(os.path.join(self.manifest_dir, name))
            # overwrite replaces bytes, so prior snapshots can no longer
            # name them — expire the history (Iceberg expire_snapshots);
            # otherwise an old snapshot_id could silently resolve to NEW
            # data for same-valued partitions
            for name in list(os.listdir(self.snapshot_dir)):
                os.unlink(os.path.join(self.snapshot_dir, name))
            # ...and neither can delete files: a stale equality delete
            # would silently suppress same-keyed rows of the REPLACEMENT
            # table, and a stale position delete names files that no
            # longer exist (permanently blocking compact/merge)
            if os.path.isdir(self.deletes_dir):
                shutil.rmtree(self.deletes_dir)

        todo = df.filter(~self._pstr().isin(*done) if done else F.lit(True))

        # clear uncommitted leftovers (a crash after data-write but
        # before manifest-commit leaves orphan files) so the append
        # below cannot double rows — any unmanifested dir is an orphan
        for p, pdir in self._data_partitions().items():
            if p not in self.committed_partitions():
                shutil.rmtree(pdir)

        # THE single execution of the upstream plan
        todo.write.mode("append").partitionBy(pcol).parquet(self.data_dir)

        # metrics from the parquet footers of the files just written —
        # metadata-only reads, no second pass over the data
        import pyarrow.parquet as pq

        committed_before = self.committed_partitions()
        metrics: dict[str, dict] = {}
        for p, pdir in self._data_partitions().items():
            if p in committed_before:
                continue
            n_rows, files = 0, []
            for fn in sorted(os.listdir(pdir)):
                if fn.endswith(".parquet"):
                    fmeta = pq.ParquetFile(os.path.join(pdir, fn)).metadata
                    n_rows += fmeta.num_rows
                    files.append({"file": fn, "rows": fmeta.num_rows,
                                  "stats": _file_column_stats(fmeta)})
            metrics[p] = {"n_rows": n_rows, "files": files}

        # AUDIT gate (write-audit-publish): scan the bytes just written
        # — not the input plan, so the audit sees exactly what a reader
        # would — and refuse to publish a violating batch
        if expectations and metrics:
            from ..operators.expectations import ExpectationError, audit

            pdirs = self._data_partitions()
            new_dirs = [pdirs[p] for p in metrics]
            spark = df.sparkSession
            scan = spark.read.option("basePath", self.data_dir).parquet(*new_dirs)
            report = audit(scan, expectations)
            report["partitions_audited"] = sorted(metrics)
            os.makedirs(os.path.join(self.root, "_audits"), exist_ok=True)
            ordinal = len(os.listdir(os.path.join(self.root, "_audits")))
            report["passed"] = not any(report["violations"].values())
            with open(
                os.path.join(self.root, "_audits", f"audit-{ordinal}.json"), "w"
            ) as f:
                json.dump(report, f)
            if not report["passed"]:
                # leave the partitions unmanifested: invisible to every
                # read; the next resume-mode write rewrites them
                raise ExpectationError(report)

        # persist the schema log only after the audit gate: a REJECTED
        # batch must not publish its schema evolution either (r5 review
        # — the save used to run pre-audit, so a failed
        # write-audit-publish still added the new column with its
        # default on every pre-existing row). Saved before the manifest
        # commit so even an empty/fresh table read returns real columns.
        self._save_schema_registry(reg)

        # commit manifests AFTER the data lands (write tmp, fsync,
        # rename): a crash in between leaves the partition uncommitted
        # and invisible to read(); the next resume rewrites it
        committed = []
        for p, m in metrics.items():
            path = self._manifest_path(p)
            tmp = path + ".tmp"
            payload = {
                "partition": p,
                "metrics": {"n_rows": m["n_rows"]},
                "lineage": {
                    "written_at": time.time(),
                    "partition_col": pcol,
                    "mode": mode,
                    "schema_id": schema_id,
                    "files": m["files"],
                },
            }
            with open(tmp, "w") as f:
                json.dump(payload, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            committed.append(p)

        snapshot = {
            "snapshot_id": len(os.listdir(self.snapshot_dir)),
            "schema_id": schema_id,
            "committed_now": sorted(committed),
            "total_committed": sorted(self.committed_partitions()),
            "rows_written": sum(m["n_rows"] for m in metrics.values()),
            # deletes in force when this snapshot was taken: time-travel
            # here re-applies exactly these (a deleted key appended
            # again stays invisible — global equality semantics)
            "deletes": [d["name"] for d in self.committed_deletes()],
        }
        with open(
            os.path.join(self.snapshot_dir, f"snap-{snapshot['snapshot_id']}.json"), "w"
        ) as f:
            json.dump(snapshot, f)
        return snapshot

    # ----------------------------------------------------------------- read

    def snapshots(self) -> list[dict]:
        """Snapshot history, oldest first (snap-<n>.json summaries)."""
        if not os.path.isdir(self.snapshot_dir):
            return []
        out = []
        for name in sorted(
            os.listdir(self.snapshot_dir),
            key=lambda n: int(n[len("snap-") : -len(".json")]),
        ):
            with open(os.path.join(self.snapshot_dir, name)) as f:
                out.append(json.load(f))
        return out

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Committed partitions only — uncommitted data files (from a
        crashed run) are invisible, like an Iceberg snapshot read.

        ``snapshot_id`` time-travels to the table AS OF that snapshot:
        only partitions in its ``total_committed`` list are visible.
        Valid across an append-only history (resume-mode writes only
        ADD partitions — committed ones are immutable, so an old
        snapshot's partition list still names the same bytes). An
        ``overwrite`` write deletes prior data files, expiring earlier
        snapshots exactly like Iceberg's expire_snapshots; reading an
        expired snapshot raises.

        Schema evolution: each manifest records the schema generation
        that wrote its partition; partitions are scanned per-generation
        with that generation's EXACT schema and projected to the target
        schema, filling columns the generation predates with their
        initial-default (Iceberg v3: the default applies iff the data
        file lacks the column — later explicit NULLs stay NULL). A
        snapshot read uses the schema as of that snapshot, so columns
        added later are invisible under time-travel, like Iceberg's
        snapshot schema-id.

        Returns the persisted table schema (column order and the
        partition column's original type) even when no partition is
        committed yet."""
        self._finish_compaction()  # a crashed compact() must not hide rows
        self._finish_merge()  # roll forward a crashed merge_into
        reg, target_id, done = self._visible(snapshot_id)
        deletes = self._visible_deletes(snapshot_id)
        # (_file,_pos) are position-delete plumbing, not table columns
        return self._scan_partitions(
            spark, reg, target_id, done, deletes
        ).drop("_file", "_pos")

    def _with_positions(self, scan: DataFrame) -> DataFrame:
        """Surface the hidden _metadata columns as (_file, _pos): the
        file path RELATIVE to data_dir (stable under table moves) and
        the row's index in it — the address a position delete pins.
        Must run on the raw file scan (metadata columns don't survive a
        projection)."""
        prefix = "file:" + os.path.abspath(self.data_dir) + "/"
        return scan.select(
            "*",
            F.expr(f"substring(_metadata.file_path, {len(prefix) + 1})").alias(
                "_file"
            ),
            F.col("_metadata.row_index").alias("_pos"),
        )

    def _scan_partitions(
        self,
        spark: SparkSession,
        reg: dict | None,
        target_id: int | None,
        done: set,
        deletes: list[dict],
        with_meta: bool | None = None,
    ) -> DataFrame:
        """Schema-aware scan of an explicit committed-partition set —
        the shared tail of read() and read_incremental(). ``with_meta``
        surfaces (_file, _pos) address columns; defaults to whatever the
        delete list needs (position deletes anti-join on them). The
        caller drops them when they were only plumbing."""
        if with_meta is None:
            with_meta = any(
                d.get("kind", "equality") == "position" for d in deletes
            )
        saved = self.schema_as_of(target_id) if reg is not None else None
        meta_ddl = ", _file string, _pos long" if with_meta else ""
        if not done:
            if saved is not None:
                base = spark.createDataFrame([], schema=saved)
                if with_meta:
                    base = base.select(
                        "*",
                        F.lit(None).cast("string").alias("_file"),
                        F.lit(None).cast("long").alias("_pos"),
                    )
                return base
            return spark.createDataFrame(
                [], schema=f"{self.partition_col} string{meta_ddl}"
            )
        if saved is None:
            # no schema log (foreign table): single inferred scan
            scan = spark.read.parquet(self.data_dir)
            if with_meta:
                scan = self._with_positions(scan)
            return self._apply_deletes(
                spark, scan.filter(self._pstr().isin(*done)), deletes
            )

        default_of = self._defaults()
        extra = ("_file", "_pos") if with_meta else ()
        parts = []
        for sid, ps in sorted(self._group_by_schema(done).items()):
            # clamp: under time-travel a column added after target_id
            # must not leak in even if the file physically has it
            gschema = self.schema_as_of(min(sid, target_id))
            # explicit per-generation schema: no footer inference (the
            # dir mixes generations), and the partition column keeps
            # its written type instead of hive-dir re-inference
            scan = spark.read.schema(gschema).parquet(self.data_dir)
            if with_meta:
                scan = self._with_positions(scan)
            scan = scan.filter(self._pstr().isin(*ps))
            parts.append(
                self._project_to(scan, gschema, saved, default_of, extra)
            )
        df = parts[0]
        for extra_df in parts[1:]:
            df = df.unionByName(extra_df)
        return self._apply_deletes(spark, df, deletes)

    def read_incremental(
        self,
        spark: SparkSession,
        from_snapshot_id: int | None = None,
        to_snapshot_id: int | None = None,
        apply_deletes: bool = True,
    ) -> DataFrame:
        """Incremental (CDC-style) scan: rows in partitions committed
        AFTER ``from_snapshot_id`` and visible AS OF ``to_snapshot_id``
        — Iceberg's incremental append scan. A downstream consumer
        (index builder, stats refresher, replication) reads only what
        changed instead of the whole table.

        Semantics, pinned by tests:
        - ``from=None`` means "from the beginning" (equals a full read
          as of ``to``); ``to=None`` means the latest snapshot.
        - Committed partitions are immutable and resume-mode writes only
          ADD partitions, so the diff of the two snapshots'
          ``total_committed`` lists IS the appended data.
        - An overwrite expires ALL prior snapshots and restarts ids at
          0 (see write()), so a consumer can never silently diff across
          one — its stored from-id either resolves inside the new
          history or is unknown. The subset guard below additionally
          rejects ranges whose diff is undefined (inverted from/to, or
          any history where from's partitions aren't contained in
          to's), the cases Iceberg's incremental read also refuses.
        - ``apply_deletes=True`` (default) applies the equality deletes
          in force at ``to``, so the increment never resurrects rows a
          takedown erased; ``False`` gives the raw append stream.
        """
        self._finish_compaction()
        self._finish_merge()  # roll forward a crashed merge_into
        snaps = {s["snapshot_id"]: s for s in self.snapshots()}
        if to_snapshot_id is None:
            if not snaps:  # nothing ever committed
                return self._scan_partitions(
                    spark, self._load_schema_registry(), None, set(), []
                )
            to_snapshot_id = max(snaps)
        reg, target_id, to_done = self._visible(to_snapshot_id)
        done = set(to_done)
        if from_snapshot_id is not None:
            if from_snapshot_id not in snaps:
                raise ValueError(
                    f"unknown from_snapshot_id {from_snapshot_id}; "
                    f"have {sorted(snaps)}"
                )
            from_done = set(snaps[from_snapshot_id]["total_committed"])
            if not from_done <= done:
                raise ValueError(
                    f"snapshots {from_snapshot_id}..{to_snapshot_id} span an "
                    "overwrite; incremental scan is undefined across it"
                )
            done -= from_done
        deletes = self._visible_deletes(to_snapshot_id) if apply_deletes else []
        return self._scan_partitions(
            spark, reg, target_id, done, deletes
        ).drop("_file", "_pos")

    def _visible(self, snapshot_id: int | None) -> tuple[dict | None, int | None, set]:
        """(schema registry, target schema id, visible partitions) for a
        read — current table state, or as-of ``snapshot_id``."""
        reg = self._load_schema_registry()
        target_id = reg["current_id"] if reg is not None else None
        done = self.committed_partitions()
        if snapshot_id is not None:
            snaps = {s["snapshot_id"]: s for s in self.snapshots()}
            if snapshot_id not in snaps:
                raise ValueError(
                    f"unknown snapshot_id {snapshot_id}; "
                    f"have {sorted(snaps)}"
                )
            wanted = set(snaps[snapshot_id]["total_committed"])
            missing = wanted - done
            if missing:
                raise ValueError(
                    f"snapshot {snapshot_id} is expired: partitions "
                    f"{sorted(missing)} were removed by a later overwrite"
                )
            done = wanted
            # pre-evolution snapshots carry no schema_id: current stands
            target_id = snaps[snapshot_id].get("schema_id", target_id)
        return reg, target_id, done

    def _group_by_schema(self, done: set) -> dict[int, list[str]]:
        """Group partitions by the generation that wrote them (committed
        partitions are immutable, so the manifest's schema_id is the
        file truth); pre-evolution manifests are generation 0."""
        by_sid: dict[int, list[str]] = {}
        for p in done:
            with open(self._manifest_path(p)) as f:
                sid = json.load(f)["lineage"].get("schema_id", 0)
            by_sid.setdefault(sid, []).append(p)
        return by_sid

    def _defaults(self) -> dict:
        """column -> initial-default from the generation that added it."""
        reg = self._load_schema_registry()
        default_of: dict = {}
        for gen in (reg or {}).get("schemas", []):
            default_of.update(gen.get("defaults", {}))
        return default_of

    @staticmethod
    def _project_to(scan: DataFrame, gschema: StructType, saved: StructType,
                    default_of: dict, extra: tuple = ()) -> DataFrame:
        have = {f.name for f in gschema.fields}
        return scan.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in have
                else F.lit(default_of.get(f.name)).cast(f.dataType).alias(f.name)
                for f in saved.fields
            ],
            *[F.col(c) for c in extra],
        )

    # ------------------------------------------------- bloom file skipping

    def add_blooms(self, col: str, n_bits: int = 8192, k: int = 6,
                   partitions: list[str] | None = None,
                   force: bool = False) -> dict:
        """Attach a per-file Bloom filter over ``col`` to the manifests
        (Iceberg's bloom-filter file skipping). Min/max stats are
        useless for point lookups on a high-cardinality key (every
        file's [min, max] url range spans the query); a 1 KB bloom per
        file answers "definitely not in this file" with ~0.5% false
        positives at 8192 bits / 6 hashes / ~1k keys.

        Metadata-side maintenance: reads ONLY ``col``'s column chunks
        via pyarrow (no Spark job), rewrites each manifest atomically
        (tmp+fsync+rename — additive metadata, row counts untouched, so
        concurrent readers are unaffected). Idempotent; ``force``
        rebuilds filters that already exist. Compaction re-runs this
        for partitions whose old manifest carried blooms."""
        import base64

        import pyarrow.parquet as pq

        pdirs = self._data_partitions()
        todo = partitions if partitions is not None else sorted(
            self.committed_partitions()
        )
        built = 0
        for p in todo:
            mpath = self._manifest_path(p)
            with open(mpath) as f:
                manifest = json.load(f)
            changed = False
            for finfo in manifest["lineage"]["files"]:
                blooms = finfo.setdefault("bloom", {})
                if col in blooms and not force:
                    continue
                path = os.path.join(pdirs[p], finfo["file"])
                import pyarrow as pa

                try:
                    values = pq.read_table(path, columns=[col])[col]
                except (KeyError, pa.lib.ArrowInvalid):
                    continue  # file predates the column / no such column
                bits = bytearray(n_bits // 8)
                n_vals = 0
                for v in values:
                    v = v.as_py()
                    if v is None:
                        continue
                    n_vals += 1
                    for pos in _bloom_positions(v, n_bits, k):
                        bits[pos >> 3] |= 1 << (pos & 7)
                blooms[col] = {
                    "b64": base64.b64encode(bytes(bits)).decode("ascii"),
                    "n_bits": n_bits,
                    "k": k,
                    "n_values": n_vals,
                }
                changed = True
                built += 1
            if changed:
                with open(mpath + ".tmp", "w") as f:
                    json.dump(manifest, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(mpath + ".tmp", mpath)
        return {"col": col, "files_built": built}

    def prune_files_eq(self, col: str, value,
                       snapshot_id: int | None = None) -> dict:
        """Point-lookup file skipping: a file is kept unless its min/max
        stats exclude ``value`` OR its bloom filter says definitely-not-
        present. Files without either are kept (cannot-prune is
        conservative). Same return shape as prune_files."""
        import base64

        _, target_id, done = self._visible(snapshot_id)
        pdirs = self._data_partitions()
        groups: dict[int, list[str]] = {}
        total = kept = 0
        for sid, ps in self._group_by_schema(done).items():
            sid = min(sid, target_id) if target_id is not None else sid
            for p in ps:
                with open(self._manifest_path(p)) as f:
                    manifest = json.load(f)
                for finfo in manifest["lineage"]["files"]:
                    total += 1
                    keep = True
                    st = finfo.get("stats", {}).get(col)
                    if st is not None and not (st["min"] <= value <= st["max"]):
                        keep = False
                    bl = finfo.get("bloom", {}).get(col)
                    if keep and bl is not None:
                        bits = base64.b64decode(bl["b64"])
                        keep = all(
                            bits[pos >> 3] & (1 << (pos & 7))
                            for pos in _bloom_positions(
                                value, bl["n_bits"], bl["k"]
                            )
                        )
                    if keep:
                        kept += 1
                        groups.setdefault(sid, []).append(
                            os.path.join(pdirs[p], finfo["file"])
                        )
        return {"groups": groups, "files_total": total, "files_kept": kept}

    # ------------------------------------------------------- file skipping

    def prune_files(self, col: str, lo=None, hi=None,
                    snapshot_id: int | None = None) -> dict:
        """Manifest-level file skipping (Iceberg's min/max pruning): the
        data files whose footer stats could contain ``lo <= col <= hi``,
        grouped by schema generation. Files without usable stats for
        ``col`` are kept (cannot-prune is conservative); files from
        generations that predate an evolved column hold its
        initial-default in every row, so they survive iff the default
        itself is in range. Returns {"groups": {sid: [paths]},
        "files_total": n, "files_kept": k}."""
        _, target_id, done = self._visible(snapshot_id)
        pdirs = self._data_partitions()
        groups: dict[int, list[str]] = {}
        total = kept = 0
        default_of = self._defaults()
        for sid, ps in self._group_by_schema(done).items():
            sid = min(sid, target_id) if target_id is not None else sid
            gschema = self.schema_as_of(sid)
            in_gen = gschema is None or col in {f.name for f in gschema.fields}
            for p in ps:
                with open(self._manifest_path(p)) as f:
                    manifest = json.load(f)
                for finfo in manifest["lineage"]["files"]:
                    total += 1
                    if in_gen:
                        st = finfo.get("stats", {}).get(col)
                        keep = st is None or (
                            (lo is None or st["max"] >= lo)
                            and (hi is None or st["min"] <= hi)
                        )
                    else:
                        d = default_of.get(col)
                        keep = d is not None and (
                            (lo is None or d >= lo) and (hi is None or d <= hi)
                        )
                    if keep:
                        kept += 1
                        groups.setdefault(sid, []).append(
                            os.path.join(pdirs[p], finfo["file"])
                        )
        return {"groups": groups, "files_total": total, "files_kept": kept}

    def read_pruned(self, spark: SparkSession, col: str, lo=None, hi=None,
                    snapshot_id: int | None = None) -> DataFrame:
        """Range scan with manifest file skipping: only the files
        ``prune_files`` keeps are listed to Spark (basePath preserves
        hive partition parsing), then the row-level ``between`` filter
        runs on top — skipping is an optimization, never a semantic.
        Equivalent to ``read(...).filter(col between lo and hi)`` by
        construction; the win is planning/IO on a 100 TB table where
        the predicate touches a sliver of files."""
        reg, target_id, done = self._visible(snapshot_id)
        saved = self.schema_as_of(target_id) if reg is not None else None
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(col) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(col) <= F.lit(hi))
        pruned = self.prune_files(col, lo, hi, snapshot_id=snapshot_id)
        if not done or not pruned["files_kept"]:
            if saved is not None:
                return spark.createDataFrame([], schema=saved)
            return spark.createDataFrame([], schema=f"{self.partition_col} string")
        deletes = self._visible_deletes(snapshot_id)
        # position deletes anti-join on (_file,_pos): surface them here
        # exactly like _scan_partitions does (r5 review — the pruned
        # path used to raise whenever a position delete was pending)
        with_meta = any(
            d.get("kind", "equality") == "position" for d in deletes
        )
        default_of = self._defaults()
        extra_cols = ("_file", "_pos") if with_meta else ()
        parts = []
        for sid, paths in sorted(pruned["groups"].items()):
            gschema = self.schema_as_of(sid) if reg is not None else None
            if gschema is None:  # foreign table: inferred scan
                scan = spark.read.option("basePath", self.data_dir).parquet(*paths)
                if with_meta:
                    scan = self._with_positions(scan)
                parts.append(scan)
                continue
            scan = (
                spark.read.schema(gschema)
                .option("basePath", self.data_dir)
                .parquet(*paths)
            )
            if with_meta:
                scan = self._with_positions(scan)
            parts.append(
                self._project_to(scan, gschema, saved, default_of, extra_cols)
            )
        df = parts[0]
        for extra in parts[1:]:
            df = df.unionByName(extra)
        return self._apply_deletes(spark, df.filter(cond), deletes).drop(
            "_file", "_pos"
        )

    def partition_metrics(self) -> dict[str, dict]:
        out = {}
        for p in self.committed_partitions():
            with open(self._manifest_path(p)) as f:
                out[p] = json.load(f)
        return out

    # ------------------------------------------------------------- deletes

    @property
    def deletes_dir(self) -> str:
        return os.path.join(self.root, "_deletes")

    def committed_deletes(self) -> list[dict]:
        """Visible equality-delete files, oldest first: a delete is
        committed iff its .json marker exists (the data dir alone is an
        orphan of a crashed delete_where and is invisible)."""
        if not os.path.isdir(self.deletes_dir):
            return []
        out = []
        for name in os.listdir(self.deletes_dir):
            if name.endswith(".json"):
                with open(os.path.join(self.deletes_dir, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda d: d["ordinal"])

    def _clean_orphan_deletes(self) -> None:
        marked = {d["name"] for d in self.committed_deletes()}
        if not os.path.isdir(self.deletes_dir):
            return
        for name in os.listdir(self.deletes_dir):
            path = os.path.join(self.deletes_dir, name)
            if os.path.isdir(path) and name not in marked:
                shutil.rmtree(path)

    def delete_where(self, spark: SparkSession, predicate: str,
                     key_col: str = "url") -> dict:
        """Row-level delete by equality keys — the Iceberg v2
        merge-on-read shape, and the operation a web-corpus table
        actually needs (retroactive PII / takedown / right-to-be-
        forgotten erasure): no partition is rewritten at delete time;
        the matching rows' ``key_col`` values are written as a delete
        file that every read anti-joins away, and a later
        ``compact(apply_deletes=True)`` physically rewrites them out.

        Deliberate divergence from Iceberg's sequence-number scoping,
        suited to erasure: the delete is GLOBAL — a key deleted once
        stays invisible even if a later append re-ingests it (a
        re-crawl of a taken-down page must not resurrect it). Reads
        before the delete's snapshot still time-travel to the
        undeleted view until the delete is materialized.

        Crash-safe: keys land in ``_deletes/del-<n>.tmp`` (Spark
        write), the dir renames into place, and only then the .json
        marker commits (tmp+fsync+rename) — a crash at any point
        leaves an invisible orphan dir that the next entry cleans.
        """
        self._finish_compaction()
        self._finish_merge()  # roll forward a crashed merge_into
        self._clean_orphan_deletes()
        keys = self.read(spark).filter(predicate).select(key_col).distinct()
        return self._commit_delete(
            keys, {"kind": "equality", "key_col": key_col, "predicate": predicate}
        )

    def delete_positions(self, spark: SparkSession, predicate: str) -> dict:
        """Row-level delete by POSITION — Iceberg v2's second delete
        flavor: the matching rows' exact addresses (data file relative
        to data_dir + row index in it, via Spark's hidden ``_metadata``
        columns) are written as a delete file that every read
        anti-joins away on (_file, _pos).

        Equality vs position is a real trade, not redundancy: an
        equality delete needs a key column and suppresses the key
        FOREVER (takedown semantics — re-ingested rows stay hidden);
        a position delete pins exactly the rows that matched NOW —
        later appends of identical content are unaffected (fix a bad
        batch without embargoing its keys). Because positions name
        exact files, ``compact`` refuses to rewrite files while any
        position delete is pending unless it materializes them
        (``apply_deletes=True``) — a rewrite would silently orphan the
        addresses and resurrect the rows.

        ``_file``/``_pos`` are reserved plumbing names; user tables
        must not carry columns with those names. Crash-safety protocol
        is shared with delete_where (_commit_delete)."""
        self._finish_compaction()
        self._finish_merge()  # roll forward a crashed merge_into
        self._clean_orphan_deletes()
        reg, target_id, done = self._visible(None)
        deletes = self._visible_deletes(None)
        view = self._scan_partitions(
            spark, reg, target_id, done, deletes, with_meta=True
        )
        addrs = view.filter(predicate).select("_file", "_pos").distinct()
        return self._commit_delete(
            addrs, {"kind": "position", "predicate": predicate}
        )

    def _commit_delete(self, frame: DataFrame, fields: dict) -> dict:
        """Shared delete commit: frame -> ``_deletes/del-<n>.tmp``
        (Spark write), dir renames into place, and only then the .json
        marker commits (tmp+fsync+rename) — a crash at any point leaves
        an invisible orphan dir that the next entry cleans. Appends a
        snapshot so time-travel scopes the delete."""
        os.makedirs(self.deletes_dir, exist_ok=True)
        existing = self.committed_deletes()
        ordinal = (existing[-1]["ordinal"] + 1) if existing else 0
        name = f"del-{ordinal}"
        ddir = os.path.join(self.deletes_dir, name)
        tmp = ddir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        frame.write.mode("overwrite").parquet(tmp)
        os.replace(tmp, ddir)
        import pyarrow.parquet as pq

        n_keys = sum(
            pq.ParquetFile(os.path.join(ddir, fn)).metadata.num_rows
            for fn in os.listdir(ddir)
            if fn.endswith(".parquet")
        )
        marker = {
            "name": name,
            "ordinal": ordinal,
            **fields,
            "n_keys": n_keys,
            "created_at": time.time(),
        }
        mpath = os.path.join(self.deletes_dir, name + ".json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(marker, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(mpath + ".tmp", mpath)

        snapshot = {
            "snapshot_id": len(os.listdir(self.snapshot_dir))
            if os.path.isdir(self.snapshot_dir) else 0,
            "delete": marker,
            "deletes": [d["name"] for d in self.committed_deletes()],
            "total_committed": sorted(self.committed_partitions()),
            "rows_written": 0,
        }
        reg = self._load_schema_registry()
        if reg is not None:
            snapshot["schema_id"] = reg["current_id"]
        if os.path.isdir(self.snapshot_dir):
            with open(os.path.join(
                self.snapshot_dir, f"snap-{snapshot['snapshot_id']}.json"
            ), "w") as f:
                json.dump(snapshot, f)
        return snapshot

    def _visible_deletes(self, snapshot_id: int | None) -> list[dict]:
        """Delete files a read must apply: all committed ones, or — for
        time travel — the set recorded in that snapshot (pre-delete
        snapshots carry none, so they still show the undeleted rows)."""
        committed = {d["name"]: d for d in self.committed_deletes()}
        if snapshot_id is None:
            return list(committed.values())
        snaps = self.snapshots()
        names = {s["snapshot_id"]: s for s in snaps}.get(snapshot_id, {}).get(
            "deletes", []
        )
        # a materialized delete's effect is baked into the data files,
        # so re-applying it is a no-op — skip silently; an UNKNOWN name
        # means the table lost state and must fail loudly
        baked = {n for s in snaps for n in s.get("materialized_deletes", [])}
        missing = [n for n in names if n not in committed and n not in baked]
        if missing:
            raise ValueError(
                f"snapshot {snapshot_id} references removed delete "
                f"files {missing}"
            )
        return [committed[n] for n in names if n in committed]

    def _apply_deletes(self, spark: SparkSession, df: DataFrame,
                       deletes: list[dict]) -> DataFrame:
        """Anti-join the delete files away: one join per distinct
        equality key column (normally one) plus one (_file,_pos) join
        for all position deletes. The delete sets are small relative to
        the table by nature (erasure requests), so AQE broadcasts them;
        the joins are the whole merge-on-read cost."""
        if not deletes or not df.columns:
            return df
        by_col: dict[str, list[str]] = {}
        pos_dirs: list[str] = []
        for d in deletes:
            path = os.path.join(self.deletes_dir, d["name"])
            if d.get("kind", "equality") == "position":
                pos_dirs.append(path)
            else:
                by_col.setdefault(d["key_col"], []).append(path)
        for col, dirs in sorted(by_col.items()):
            if col not in df.columns:
                continue
            keys = spark.read.parquet(*dirs).select(col).distinct()
            df = df.join(keys, on=col, how="left_anti")
        if pos_dirs:
            if "_file" not in df.columns or "_pos" not in df.columns:
                raise RuntimeError(
                    "internal: position deletes require the scan to carry "
                    "(_file,_pos) — _scan_partitions(with_meta=True)"
                )
            addrs = spark.read.parquet(*pos_dirs).select("_file", "_pos").distinct()
            df = df.join(addrs, on=["_file", "_pos"], how="left_anti")
        return df

    # ------------------------------------------------------------- compact

    @property
    def _compact_marker(self) -> str:
        return os.path.join(self.root, "_compacting_partition.json")

    def _finish_compaction(self) -> bool:
        """Roll FORWARD an interrupted ``compact`` partition swap (same
        write-ahead-marker protocol as the IVF index compaction: the
        marker is written only after the replacement files are fully on
        disk, so finishing is always safe). Returns True if recovery
        work was done."""
        if not os.path.exists(self._compact_marker):
            return False
        with open(self._compact_marker) as f:
            marker = json.load(f)
        pdir = marker["pdir"]
        tmp, old = pdir + ".compact_tmp", pdir + ".old"
        if os.path.isdir(tmp):
            if os.path.isdir(pdir) and not os.path.isdir(old):
                os.rename(pdir, old)
            if not os.path.isdir(pdir):
                os.rename(tmp, pdir)
        # complete step 4 too: the marker carries the new manifest
        # payload, so a crash between the swap and the manifest rewrite
        # cannot leave lineage.files pointing at the deleted small files
        # (idempotent — rewriting an already-updated manifest is a no-op)
        if "manifest" in marker:
            mpath = self._manifest_path(marker["partition"])
            with open(mpath + ".tmp", "w") as f:
                json.dump(marker["manifest"], f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(mpath + ".tmp", mpath)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        os.unlink(self._compact_marker)
        return True

    def compact(self, spark: SparkSession, min_files: int = 2,
                apply_deletes: bool = False,
                layout_cols: list[str] | None = None,
                target_files: int = 1) -> dict:
        """Merge each committed partition's many small parquet files
        into one — the Iceberg ``rewrite_data_files`` maintenance op.
        A 100 TB table written by wide jobs accumulates
        tasks-per-partition small files; scan planning and footer reads
        degrade linearly in file count, so periodic compaction is part
        of the table contract, not an optimization.

        Per-partition protocol (crash-safe, read-consistent):
          1. rewrite the partition's rows to ``<pdir>.compact_tmp``
             (coalesce(1); rows are unchanged, only file layout)
          2. write the marker (commit point — always rolls forward)
          3. swap: pdir -> pdir.old, tmp -> pdir
          4. rewrite the manifest from the new parquet footers (row
             count must match the old manifest — checked), drop marker

        Partition-level visibility (committed_partitions) is never
        touched, so prior snapshots remain valid — compaction changes
        bytes layout, not table contents. Appends a snapshot entry
        summarizing what was rewritten.

        ``apply_deletes=True`` additionally MATERIALIZES the committed
        equality-delete files (Iceberg's rewrite-with-deletes): every
        committed partition is rewritten with the delete keys
        anti-joined out, and the delete files are then removed. This is
        the erasure completion step — after it, the deleted rows are
        gone from STORAGE, so time-travel to pre-delete snapshots no
        longer resurrects them (the point of a takedown; analogous to
        how overwrite expires snapshots). A crash mid-run is safe: the
        per-partition swap rolls forward, and delete files are removed
        only after every partition is clean, so reads keep anti-joining
        until then.

        ``layout_cols`` + ``target_files`` turn the rewrite into Delta's
        OPTIMIZE ZORDER / Iceberg's sort-order rewrite: each partition's
        rows are re-clustered into ``target_files`` Z-curve range slices
        over those columns (sources/layout.py), so prune_files afterward
        skips on EVERY listed column. Column min/max for the curve come
        from the existing manifest file stats when usable — the layout
        rewrite then needs no extra stats scan."""
        import pyarrow.parquet as pq

        self._finish_compaction()
        self._finish_merge()  # roll forward a crashed merge_into
        self._clean_orphan_deletes()
        committed_dels = self.committed_deletes()
        has_pos = any(
            d.get("kind", "equality") == "position" for d in committed_dels
        )
        if has_pos and not apply_deletes:
            raise ValueError(
                "pending position deletes pin exact (file, row) addresses; "
                "rewriting files would orphan them and resurrect the rows — "
                "run compact(apply_deletes=True) to materialize them"
            )
        deletes = committed_dels if apply_deletes else []
        rewritten: dict[str, dict] = {}
        # hoisted out of the loop: partition_metrics() parses EVERY
        # manifest — inside the loop that is O(partitions^2) metadata
        # I/O on the wide tables compaction exists for (r5 review)
        committed_now = self.committed_partitions()
        all_metrics = self.partition_metrics()
        for p, pdir in sorted(self._data_partitions().items()):
            if p not in committed_now:
                continue  # orphan of a crashed write; resume owns it
            files = [fn for fn in os.listdir(pdir) if fn.endswith(".parquet")]
            if len(files) < min_files and not deletes and not layout_cols:
                continue
            old_manifest = all_metrics[p]
            tmp = pdir + ".compact_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            # rows only — the partition column lives in the dir name
            scan = spark.read.parquet(pdir)
            if deletes:
                if has_pos:
                    # per-partition scan still lives under data_dir, so
                    # the same relative (_file,_pos) addresses resolve
                    scan = self._with_positions(scan)
                scan = self._apply_deletes(spark, scan, deletes)
                scan = scan.drop("_file", "_pos")
            if layout_cols:
                from .layout import zorder

                out = zorder(
                    scan, layout_cols, n_files=target_files,
                    stats=_ranges_from_stats(old_manifest, layout_cols),
                )
            else:
                out = scan.coalesce(1)
            out.write.mode("overwrite").parquet(tmp)
            new_files, n_rows = [], 0
            for fn in sorted(os.listdir(tmp)):
                if fn.endswith(".parquet"):
                    meta = pq.ParquetFile(os.path.join(tmp, fn)).metadata
                    n_rows += meta.num_rows
                    new_files.append({"file": fn, "rows": meta.num_rows,
                                      "stats": _file_column_stats(meta)})
            if not deletes and n_rows != old_manifest["metrics"]["n_rows"]:
                shutil.rmtree(tmp)
                raise RuntimeError(
                    f"compaction row-count mismatch for partition {p!r}: "
                    f"{n_rows} != {old_manifest['metrics']['n_rows']} — aborted"
                )
            if deletes and n_rows > old_manifest["metrics"]["n_rows"]:
                shutil.rmtree(tmp)
                raise RuntimeError(
                    f"delete materialization GREW partition {p!r}: "
                    f"{n_rows} > {old_manifest['metrics']['n_rows']} — aborted"
                )
            payload = dict(old_manifest)
            payload["metrics"] = dict(old_manifest["metrics"])
            payload["metrics"]["n_rows"] = n_rows
            payload["lineage"] = dict(old_manifest["lineage"])
            payload["lineage"]["files"] = new_files
            payload["lineage"]["compacted_at"] = time.time()
            payload["lineage"]["compacted_from_n_files"] = len(files)
            # the marker carries the full new manifest so recovery can
            # finish step 4 (manifest rewrite), not just the dir swap
            with open(self._compact_marker + ".tmp", "w") as f:
                json.dump({"pdir": pdir, "partition": p, "manifest": payload}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(self._compact_marker + ".tmp", self._compact_marker)
            os.rename(pdir, pdir + ".old")
            os.rename(tmp, pdir)
            mpath = self._manifest_path(p)
            with open(mpath + ".tmp", "w") as f:
                json.dump(payload, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(mpath + ".tmp", mpath)
            shutil.rmtree(pdir + ".old", ignore_errors=True)
            os.unlink(self._compact_marker)
            rewritten[p] = {"files_before": len(files), "files_after": len(new_files)}
            # blooms name the OLD files' contents — rebuild them over
            # the rewritten files with the same parameters
            old_blooms = {
                c: bl
                for fr in old_manifest["lineage"]["files"]
                for c, bl in (fr.get("bloom") or {}).items()
            }
            for c, bl in sorted(old_blooms.items()):
                self.add_blooms(
                    c, n_bits=bl["n_bits"], k=bl["k"], partitions=[p]
                )

        materialized = []
        if deletes:
            # every committed partition is now physically clean: retire
            # the delete files (marker first — once it is gone the
            # delete is invisible; a crash before the rmtree leaves an
            # orphan dir the next entry cleans)
            for d in deletes:
                os.unlink(os.path.join(self.deletes_dir, d["name"] + ".json"))
                shutil.rmtree(
                    os.path.join(self.deletes_dir, d["name"]), ignore_errors=True
                )
                materialized.append(d["name"])

        snapshot = {
            "snapshot_id": len(os.listdir(self.snapshot_dir))
            if os.path.isdir(self.snapshot_dir)
            else 0,
            "compaction": rewritten,
            "total_committed": sorted(self.committed_partitions()),
            "rows_written": 0,
            "deletes": [d["name"] for d in self.committed_deletes()],
        }
        if layout_cols:
            snapshot["layout_cols"] = list(layout_cols)
        if materialized:
            snapshot["materialized_deletes"] = materialized
        if os.path.isdir(self.snapshot_dir):
            with open(
                os.path.join(
                    self.snapshot_dir, f"snap-{snapshot['snapshot_id']}.json"
                ),
                "w",
            ) as f:
                json.dump(snapshot, f)
        return snapshot

    # --------------------------------------------------------------- merge

    @property
    def _merge_marker(self) -> str:
        return os.path.join(self.root, "_merging.json")

    def _finish_merge(self) -> bool:
        """Roll FORWARD an interrupted merge_into: the marker is written
        only after every staged ``.merge_tmp`` dir is fully on disk, so
        finishing (swap + manifest + snapshot reset) is always safe and
        idempotent. Returns True if recovery work was done."""
        if not os.path.exists(self._merge_marker):
            return False
        with open(self._merge_marker) as f:
            marker = json.load(f)
        for swap in marker["swaps"]:
            pdir = swap["pdir"]
            tmp, old = pdir + ".merge_tmp", pdir + ".merge_old"
            if os.path.isdir(tmp):
                if os.path.isdir(pdir) and not os.path.isdir(old):
                    os.rename(pdir, old)
                if not os.path.isdir(pdir):
                    os.rename(tmp, pdir)
            mpath = self._manifest_path(swap["partition"])
            with open(mpath + ".tmp", "w") as f:
                json.dump(swap["manifest"], f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(mpath + ".tmp", mpath)
            shutil.rmtree(old, ignore_errors=True)
            shutil.rmtree(tmp, ignore_errors=True)
        # merge rewrote committed contents: prior snapshots no longer
        # name the same bytes — expire them (the overwrite rule) and
        # leave the merge snapshot as the new history root
        if os.path.isdir(self.snapshot_dir):
            for name in list(os.listdir(self.snapshot_dir)):
                os.unlink(os.path.join(self.snapshot_dir, name))
        snapshot = dict(marker["snapshot"])
        snapshot["snapshot_id"] = 0
        os.makedirs(self.snapshot_dir, exist_ok=True)
        with open(os.path.join(self.snapshot_dir, "snap-0.json"), "w") as f:
            json.dump(snapshot, f)
        os.unlink(self._merge_marker)
        return True

    def merge_into(self, spark: SparkSession, source: DataFrame,
                   key_col: str = "url") -> dict:
        """MERGE INTO (copy-on-write upsert): rows in ``source`` whose
        ``key_col`` matches an existing row REPLACE it (even across a
        partition-value change); unmatched rows append. The Iceberg /
        Delta ``MERGE`` verb, restricted to the upsert shape a curation
        table needs (re-crawl refreshes page content in place).

        Mechanics, built on the partition-immutability model:
        - new partition values commit through the normal resume write
          FIRST (idempotent if the merge is retried after a crash);
        - every committed partition that holds a matching key or gains
          source rows is staged in full to ``<pdir>.merge_tmp`` as
          (current visible rows anti-join source keys) ∪ (source rows
          of that partition), with equality deletes applied and all
          generations projected to the CURRENT schema;
        - a single ``_merging.json`` write-ahead marker (the commit
          point — carries every swap's manifest and the final snapshot)
          then swaps all staged partitions; a crash at any point before
          the marker changes nothing, after it rolls forward.

        Because committed bytes change, prior snapshots are EXPIRED and
        the merge snapshot becomes the new history root — the same rule
        as overwrite (documented divergence from Iceberg, whose catalog
        pins per-snapshot file lists). Source cardinality is checked:
        duplicate keys in ``source`` raise (Iceberg's MERGE cardinality
        rule); NULL keys never match and simply append. Pending
        position deletes must be materialized first (their addresses
        would be orphaned by the rewrite); equality deletes stay in
        force globally — merging a key that was taken down leaves it
        hidden, by design. Bloom filters describe the replaced files
        and are dropped from rewritten partitions' manifests — re-run
        add_blooms after a merge (prune_files_eq stays conservative
        without them)."""
        self._finish_compaction()
        self._finish_merge()
        self._clean_orphan_deletes()
        if any(d.get("kind", "equality") == "position"
               for d in self.committed_deletes()):
            raise ValueError(
                "pending position deletes pin exact (file, row) addresses; "
                "merge would rewrite the files — run "
                "compact(apply_deletes=True) first"
            )
        saved = self.schema_as_of(None)
        if saved is not None:
            have = set(source.columns)
            want = {f.name for f in saved.fields}
            if have != want:
                raise ValueError(
                    f"merge source columns {sorted(have)} != table "
                    f"columns {sorted(want)}; evolve the schema with "
                    "write(evolve=True) before merging"
                )
            source = source.select(
                *[F.col(f.name).cast(f.dataType) for f in saved.fields]
            )
        dup = (
            source.filter(F.col(key_col).isNotNull())
            .groupBy(key_col).count().filter("count > 1").limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"merge source has duplicate {key_col}={dup[0][0]!r} — "
                "MERGE cardinality requires one source row per key"
            )
        source = source.localCheckpoint(eager=True)  # one upstream execution
        pcol = self.partition_col
        src_pstr = F.coalesce(F.col(pcol).cast("string"), F.lit(NULL_PARTITION))

        done = self.committed_partitions()
        src_parts = {
            r[0] for r in source.select(src_pstr.alias("p")).distinct().collect()
        }
        new_parts = src_parts - done
        if new_parts:
            # commits its own snapshot; expired below with the rest
            self.write(
                source.filter(src_pstr.isin(*new_parts)), mode="resume"
            )
            done = self.committed_partitions()

        cur = self.read(spark)
        src_keys = source.select(key_col).where(F.col(key_col).isNotNull()).distinct()
        # one job finds the affected partitions AND the true match
        # counts (visible rows whose key the source replaces) — the
        # per-partition arithmetic an earlier draft derived from
        # physical row counts overcounted by any equality-deleted rows
        # the rewrite incidentally materializes, and cost one extra
        # count job per partition (r5 review)
        match_rows = (
            cur.join(src_keys, key_col, "left_semi")
            .groupBy(self._pstr().alias("p"))
            .count()
            .collect()
        )
        matches_by_part = {r["p"]: r["count"] for r in match_rows}
        affected = set(matches_by_part)
        rewrite = sorted((affected | (src_parts & done)) - new_parts)

        import pyarrow.parquet as pq

        swaps = []
        # the semi-join ran after the new-partition commit, so matches
        # inside new_parts are the source's OWN just-appended rows, not
        # pre-existing ones — exclude them from the stat
        n_matched = sum(
            v for p, v in matches_by_part.items() if p not in new_parts
        )
        old_metrics = self.partition_metrics()
        pdirs = self._data_partitions()
        for p in rewrite:
            pdir = pdirs[p]
            tmp = pdir + ".merge_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            keep = (
                cur.filter(self._pstr() == p)
                .join(src_keys, key_col, "left_anti")
            )
            incoming = source.filter(src_pstr == p)
            merged = keep.unionByName(incoming.select(*keep.columns)).drop(pcol)
            merged.write.mode("overwrite").parquet(tmp)
            new_files, n_rows = [], 0
            for fn in sorted(os.listdir(tmp)):
                if fn.endswith(".parquet"):
                    meta = pq.ParquetFile(os.path.join(tmp, fn)).metadata
                    n_rows += meta.num_rows
                    new_files.append({"file": fn, "rows": meta.num_rows,
                                      "stats": _file_column_stats(meta)})
            old_manifest = old_metrics[p]
            payload = dict(old_manifest)
            payload["metrics"] = {"n_rows": n_rows}
            payload["lineage"] = dict(old_manifest["lineage"])
            payload["lineage"]["files"] = new_files
            payload["lineage"]["merged_at"] = time.time()
            reg = self._load_schema_registry()
            if reg is not None:
                payload["lineage"]["schema_id"] = reg["current_id"]
            swaps.append({"pdir": pdir, "partition": p, "manifest": payload})

        snapshot = {
            "merge": {
                "key_col": key_col,
                "partitions_rewritten": rewrite,
                "partitions_added": sorted(new_parts),
                "rows_matched": n_matched,
            },
            "total_committed": sorted(self.committed_partitions()),
            "rows_written": 0,
            "deletes": [d["name"] for d in self.committed_deletes()],
        }
        reg = self._load_schema_registry()
        if reg is not None:
            snapshot["schema_id"] = reg["current_id"]
        with open(self._merge_marker + ".tmp", "w") as f:
            json.dump({"swaps": swaps, "snapshot": snapshot}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(self._merge_marker + ".tmp", self._merge_marker)
        self._finish_merge()
        return self.snapshots()[-1]


def salted_repartition(
    df: DataFrame, key_col: str, n_partitions: int, salt: int = 8, salt_col: str | None = None
) -> DataFrame:
    """Spread a skewed key (e.g. url host) over `salt` subpartitions:
    repartition(n, key, pmod(hash(row-unique), salt)) — the zipf-head
    host no longer pins one task (BASELINE.json:14 skew handling).

    The salt hashes ONE cheap row-unique value — a named column if
    given, else monotonically_increasing_id() — an earlier draft hashed
    every column including 100KB html blobs just to derive 3 bits."""
    salt_src = F.col(salt_col) if salt_col else F.monotonically_increasing_id()
    return df.repartition(
        n_partitions, F.col(key_col), F.pmod(F.hash(salt_src), F.lit(salt))
    )


def url_host(col) -> "F.Column":
    return F.regexp_extract(col, r"^https?://([^/]+)", 1)
