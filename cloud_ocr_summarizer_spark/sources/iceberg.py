"""Iceberg-backed snapshot sink: the production twin of
``checkpoint.SnapshotSink`` (north_rule: "resumable from Iceberg snapshot
checkpoints").

The sandbox has no Iceberg runtime jar, so ``SnapshotSink`` (parquet
directories + a manifest JSON with the same commit/visibility rule) is
the tested stand-in; THIS class is the one-class swap for a real
deployment — same method surface, but the snapshot IS the Iceberg table
snapshot:

* ``append``        -> ``df.writeTo(table).append()``; the Iceberg commit
                       is the atomic visibility point (exactly like the
                       stand-in's manifest rename).
* ``read_committed``-> ``spark.read.table(table)`` (current snapshot).
* ``read_since``    -> incremental scan between snapshot ids
                       (``start-snapshot-id`` / ``end-snapshot-id`` read
                       options — Iceberg's own incremental-consumer API,
                       which also subsumes the stand-in's
                       min_readable_id bookkeeping: Iceberg refuses
                       expired start snapshots itself).
* ``compact_snapshots`` -> ``rewrite_data_files`` + ``expire_snapshots``
                       maintenance procedures.

Everything is gated behind ``available(spark)``; tests skip when no
Iceberg catalog is configured (the sandbox), and the flagship plan takes
any sink object with this surface (``run_flagship(sink=...)``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Catalog-qualified identifier: dot-separated plain parts.  Snapshot-id
# resolution and the maintenance procedures interpolate the table name
# into SQL strings, so anything outside this shape is rejected up front
# rather than quoted ad hoc per call site.
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")
_RUN_ID_RE = re.compile(r"^[A-Za-z0-9_-]+$")


class IcebergSnapshotSink:
    """Append-only snapshotted sink on an Iceberg table.

    ``table`` is a catalog-qualified identifier (e.g.
    ``lake.pipeline.extracted_spans``).  The catalog must be configured on
    the session (spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog).
    """

    def __init__(self, table: str) -> None:
        if not _IDENT_RE.match(table):
            raise ValueError(f"unsafe Iceberg table identifier: {table!r}")
        self.table = table

    # -- capability gate ----------------------------------------------------
    @staticmethod
    def available(spark: SparkSession) -> bool:
        """True iff the Iceberg Spark runtime is on the classpath."""
        try:
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
        except Exception:
            return False

    # -- write/commit -------------------------------------------------------
    def append(self, df: DataFrame, *, run_id: str | None = None) -> int:
        """Append df as one Iceberg snapshot; returns its snapshot id.

        The Iceberg commit is atomic: a killed job never exposes partial
        output (same invariant the parquet stand-in gets from its
        manifest rename).  ``run_id`` (generated when not supplied) lands
        in the snapshot summary, and the committed snapshot is resolved
        BY that run_id — not by "latest committed_at", which returns the
        wrong id under concurrent writers or same-millisecond commits.
        """
        import uuid as _uuid

        rid = run_id or _uuid.uuid4().hex
        if not _RUN_ID_RE.match(rid):
            # rid is interpolated into the snapshot-lookup SQL below
            raise ValueError(f"run_id must be [A-Za-z0-9_-]+, got {rid!r}")
        df.writeTo(self.table).option("snapshot-property.run_id", rid).append()
        spark = df.sparkSession
        row = spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            f"WHERE summary['run_id'] = '{rid}' "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row["snapshot_id"])

    # -- read ---------------------------------------------------------------
    def snapshots(self, spark: SparkSession) -> list[dict]:
        return [
            r.asDict()
            for r in spark.sql(
                f"SELECT snapshot_id, committed_at, operation, summary "
                f"FROM {self.table}.snapshots ORDER BY committed_at"
            ).collect()
        ]

    def read_committed(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.table(self.table)
        except Exception:
            return None  # table not created yet — nothing committed

    def read_since(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """Incremental read of rows appended strictly after ``snapshot_id``
        (Iceberg incremental scan; raises if the start snapshot has been
        expired — Iceberg's native analogue of min_readable_id).

        The scan is pinned to the CURRENT snapshot as its end: without an
        ``end-snapshot-id`` the window is open-ended, so two reads of the
        same cursor could return different rows as new commits land —
        diverging from the parquet stand-in's fixed-snapshot-set
        semantics.  Callers advance their cursor to the returned window's
        end, not to "whatever is latest at read time".

        The end snapshot comes from the table's ``main`` branch ref — the
        authoritative head pointer — not from ordering ``.snapshots`` by
        ``committed_at``, which is millisecond-granular and ties under
        concurrent/fast appends (an arbitrary tie-pick could return the
        older snapshot and permanently skip the newer one's rows).
        """
        end_row = spark.sql(
            f"SELECT snapshot_id FROM {self.table}.refs "
            "WHERE name = 'main' AND type = 'BRANCH'"
        ).first()
        if end_row is None or int(end_row["snapshot_id"]) == int(snapshot_id):
            return None  # nothing committed after the cursor
        return (
            spark.read.format("iceberg")
            .option("start-snapshot-id", str(int(snapshot_id)))
            .option("end-snapshot-id", str(int(end_row["snapshot_id"])))
            .load(self.table)
        )

    # -- maintenance --------------------------------------------------------
    def compact_snapshots(
        self, spark: SparkSession, *, keep_last: int = 1, catalog: str | None = None
    ) -> None:
        """Small-file compaction + history expiry via Iceberg procedures
        (the stand-in's compact_snapshots analogue).

        ``older_than`` is pinned to NOW: without it Iceberg only expires
        snapshots past its 5-day default, so keep_last would silently
        retain every recent snapshot instead of mirroring the stand-in's
        immediate-merge semantics.
        """
        from datetime import datetime, timezone

        cat = catalog or self.table.split(".")[0]
        spark.sql(
            f"CALL {cat}.system.rewrite_data_files(table => '{self.table}')"
        )
        now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        spark.sql(
            f"CALL {cat}.system.expire_snapshots("
            f"table => '{self.table}', "
            f"older_than => TIMESTAMP '{now}', "
            f"retain_last => {int(keep_last)})"
        )
