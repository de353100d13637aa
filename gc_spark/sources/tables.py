"""SnapshotStore — Iceberg-style snapshot/commit semantics over parquet.

The sandbox has no Iceberg jars, so this layer provides the same contract the
engine needs from Iceberg (BASELINE.json north_star: "resumable from Iceberg
snapshot checkpoints"): append-only parquet segments per table plus an
atomically-committed snapshot manifest per micro-batch. Crash between data
write and commit leaves orphan files that the next resume simply never
references — exactly Iceberg's behavior. Swap `SnapshotStore` for a real
Iceberg catalog by replacing this module; the engine only calls
begin/append/replace/commit/read/latest_batch.

Scale notes:
  - state changes are merge-on-read: the drain loop appends to `frontier`
    (discoveries) and `frontier_done` (url_hash64 of drained rows) instead of
    rewriting the frontier — the Iceberg analogue is positional delete files.
    At 10^10 rows a per-batch copy-on-write rewrite would be the bottleneck.
  - `compact()` folds segments back into one when the done-set grows past a
    threshold, like Iceberg table maintenance.

Replaces the reference's manifest copy-down/append/re-upload cycle
(gc_crawl_then_upload.sh:88-110, pipelines.py:50-92).
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SNAP_DIR = "_snapshots"


class Transaction:
    """One micro-batch's uncommitted writes.

    `suffix` distinguishes auxiliary snapshots (e.g. compaction) that share a
    logical batch number: '000007c.json' sorts after '000007.json' so it wins
    as the latest state while latest_batch() still reports 7.
    """

    def __init__(
        self, store: "SnapshotStore", batch: int, base: dict[str, list[str]], suffix: str = "",
        base_meta: dict | None = None,
    ):
        self.store = store
        self.batch = batch
        self.suffix = suffix
        # table -> ordered list of data dirs valid if this txn commits
        self.tables: dict[str, list[str]] = {k: list(v) for k, v in base.items()}
        self.lineage: list[dict] = []
        # snapshot-carried scalar state (e.g. max_seq) — copied forward from
        # the previous snapshot so readers never re-aggregate a big table for
        # a value the writer already knew
        self.meta: dict = dict(base_meta or {})

    def _write(self, df: DataFrame, rel: str) -> str:
        path = str(Path(self.store.root, rel))
        df.write.mode("overwrite").parquet(path)
        return rel

    def append(self, table: str, df: DataFrame) -> None:
        rel = self._write(df, f"{table}/b{self.batch:06d}{self.suffix}")
        self.tables.setdefault(table, []).append(rel)

    def replace(self, table: str, df: DataFrame) -> None:
        rel = self._write(df, f"{table}/v{self.batch:06d}{self.suffix}")
        self.tables[table] = [rel]

    def add_lineage(self, rows: list[dict]) -> None:
        self.lineage.extend(rows)

    def set_meta(self, key: str, value) -> None:
        self.meta[key] = value

    def commit(self) -> None:
        snap = {
            "batch": self.batch,
            "tables": self.tables,
            "lineage": self.lineage,
            "meta": self.meta,
        }
        snap_dir = Path(self.store.root, SNAP_DIR)
        snap_dir.mkdir(parents=True, exist_ok=True)
        # atomic: write tmp file then rename into place
        fd, tmp = tempfile.mkstemp(dir=snap_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(snap, f)
        os.rename(tmp, Path(snap_dir, f"{self.batch:06d}{self.suffix}.json"))


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = str(root)
        Path(self.root).mkdir(parents=True, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------

    def _snapshots(self) -> list[Path]:
        d = Path(self.root, SNAP_DIR)
        if not d.is_dir():
            return []
        return sorted(p for p in d.iterdir() if p.suffix == ".json")

    def latest_batch(self) -> int | None:
        snaps = self._snapshots()
        if not snaps:
            return None
        return json.loads(snaps[-1].read_text())["batch"]

    def _latest_tables(self) -> dict[str, list[str]]:
        snaps = self._snapshots()
        if not snaps:
            return {}
        return json.loads(snaps[-1].read_text())["tables"]

    def latest_meta(self) -> dict:
        snaps = self._snapshots()
        if not snaps:
            return {}
        return json.loads(snaps[-1].read_text()).get("meta", {})

    def snapshot_at(self, batch: int) -> dict[str, list[str]]:
        p = Path(self.root, SNAP_DIR, f"{batch:06d}.json")
        return json.loads(p.read_text())["tables"]

    def rollback_to(self, batch: int) -> None:
        """Drop snapshots newer than `batch` (data files become orphans)."""
        for p in self._snapshots():
            if json.loads(p.read_text())["batch"] > batch:
                p.unlink()

    # -- txn / io ------------------------------------------------------------

    def begin(self, batch: int, suffix: str = "") -> Transaction:
        return Transaction(
            self, batch, self._latest_tables(), suffix=suffix, base_meta=self.latest_meta()
        )

    def read(self, table: str, schema: StructType) -> DataFrame:
        rels = self._latest_tables().get(table, [])
        if not rels:
            return self.spark.createDataFrame([], schema=schema)
        paths = [str(Path(self.root, r)) for r in rels]
        return self.spark.read.schema(schema).parquet(*paths)

    def read_at(self, table: str, schema: StructType, batch: int) -> DataFrame:
        rels = self.snapshot_at(batch).get(table, [])
        if not rels:
            return self.spark.createDataFrame([], schema=schema)
        paths = [str(Path(self.root, r)) for r in rels]
        return self.spark.read.schema(schema).parquet(*paths)

    def segment_count(self, table: str) -> int:
        return len(self._latest_tables().get(table, []))

    def compact(self, table: str, schema: StructType, batch: int, df: DataFrame | None = None) -> None:
        """Fold a table's segments into one (Iceberg table-maintenance
        analog): write the (optionally transformed) current contents as a
        single replacement segment under a new snapshot. Old segments become
        unreferenced orphans."""
        cur = df if df is not None else self.read(table, schema)
        txn = self.begin(batch, suffix="c")
        txn.replace(table, cur)
        txn.commit()
