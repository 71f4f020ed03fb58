"""The replication run — entry-point B of the reference
(``process_binlog``, matomo2clickhouse.py:475-779) as a micro-batch job.

One ``run_once`` call = one cron run of the reference:

1. resume from the ledger (argmax dateid → last applied position,
   matomo2clickhouse.py:786-812, S6);
2. slice the changelog: position > resume point, clamped by the run
   budgets (row cap B4 / file cap S2/O3);
3. route per table policy (catalog.REGISTRY) and apply:
   - ``insert_as_update`` tables: versioned APPEND (P5/P6) — the hot
     path; pure columnar append partitioned by yyyymm (O11);
   - ``mutate`` tables: two-phase fold of the batch into stored state
     (appends first, then mutations — the write-ordering barrier
     B2/O6), with the F6 old-delete guard;
4. write one ledger row per (table, file) slice (S5) AFTER the data
   writes — reproducing the reference's at-least-once contract
   (doc_old_duplicates.md:6-10): a crash between data and ledger
   replays the batch; dedup-at-read (Q1) + compaction (Q3) absorb it;
5. ``dry_run=True`` plans and counts everything but writes nothing
   (S9, _settings.py:53-55).

Scale notes: every apply is a bounded-batch DataFrame op; the only
unbounded input (stored mutate-state) participates via one
broadcast-able anti-join per table. Appends never read existing data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import REGISTRY, TablePolicy
from ..operators.apply import apply_insert_as_update, apply_mutate, latest_by_key
from ..operators.dedup import dedup_in_window
from ..operators.filters import filter_pos_range, split_old_deletes, split_poison

LEDGER_SCHEMA = (
    "dateid bigint, created_at timestamp, table_name string, sql_type string,"
    " log_time timestamp, log_file bigint, log_pos_start bigint, log_pos_end bigint"
)


@dataclass
class RunConfig:
    target_dir: str
    batch_row_budget: int = 1_000_000      # replication_batch_size (_settings.py:71-73)
    max_files_per_run: int = 20            # replication_max_number_files_per_session
    old_delete_days: int = 31              # F6 horizon (matomo2clickhouse.py:593)
    dry_run: bool = False                  # EXECUTE_CLICKHOUSE=False analog (S9)
    degraded: bool = False                 # B3/O8: previous run failed — shrink
                                           # the budget so the poison surfaces
                                           # (matomo2clickhouse.py:841-847)
    quarantine: bool = True                # B3: divert invalid rows to the
                                           # reject table instead of failing

    def effective_row_budget(self) -> int:
        if self.degraded:
            # the reference's degraded formula: size // 1000 + 10
            return self.batch_row_budget // 1000 + 10
        return self.batch_row_budget


@dataclass
class RunReport:
    start_seq: int | None
    end_seq: int | None
    rows_applied: int = 0
    rows_rejected_old_delete: int = 0
    rows_quarantined: int = 0
    tables: dict = field(default_factory=dict)
    dry_run: bool = False


class ReplicationRunner:
    def __init__(self, spark: SparkSession, config: RunConfig):
        self.spark = spark
        self.cfg = config

    # --- storage paths -----------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.cfg.target_dir, "tables", name)

    @property
    def ledger_path(self) -> str:
        return os.path.join(self.cfg.target_dir, "ledger")

    # --- ledger ------------------------------------------------------------
    def read_ledger(self) -> DataFrame:
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.ledger_path)
        except Exception:
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def resume_seq(self) -> int | None:
        """S6/Q7 — argmax checkpoint lookup: resume after max applied
        position (log_pos_end of the max-dateid ledger row)."""
        led = self.read_ledger()
        row = (
            led.agg(F.max("dateid").alias("dateid"))
            .join(led, "dateid")
            .select("log_pos_end")
            .collect()
        )
        return row[0]["log_pos_end"] if row else None

    # --- one run -----------------------------------------------------------
    def run_once(self, changelog: DataFrame) -> RunReport:
        cfg = self.cfg
        start_seq = self.resume_seq()

        # B3: quarantine BEFORE position slicing — a null-position row
        # can never be attributed to the stream order, so it would
        # otherwise vanish silently in the seq-bounded budget slice.
        # (Like the reference's poison statements, an unfixed bad row
        # re-surfaces every run until the operator clears it.)
        if cfg.quarantine:
            ok, poisoned = split_poison(changelog, ["key"])
        else:
            ok, poisoned = changelog, None

        batch = filter_pos_range(ok, start_seq, None)

        # O3/S2: clamp to N changelog files per run
        files = [
            r["file_seq"]
            for r in batch.select("file_seq").distinct().orderBy("file_seq")
            .limit(cfg.max_files_per_run).collect()
        ]
        if not files:
            return RunReport(start_seq, start_seq, dry_run=cfg.dry_run)
        batch = batch.filter(F.col("file_seq").isin(files))

        # B4: row budget — deterministic prefix of the remaining stream
        # (seq-bounded rather than limit() so replays slice identically)
        bounds = batch.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
        hi = bounds["hi"]
        budget = cfg.effective_row_budget()
        if budget is not None and bounds["lo"] is not None:
            capped = (
                batch.orderBy("seq").limit(budget)
                .agg(F.max("seq").alias("hi")).collect()[0]["hi"]
            )
            hi = capped
            batch = batch.filter(F.col("seq") <= hi)

        batch = batch.cache()
        report = RunReport(start_seq, hi, dry_run=cfg.dry_run)

        if poisoned is not None:
            report.rows_quarantined = poisoned.count()
            if report.rows_quarantined and not cfg.dry_run:
                poisoned.coalesce(1).write.mode("append").parquet(
                    os.path.join(cfg.target_dir, "rejects")
                )

        # F6: old-delete rejection against the batch's own clock
        now = batch.agg(F.max("ts").alias("now_ts"))
        with_now = batch.crossJoin(F.broadcast(now))
        kept, rejected = split_old_deletes(
            with_now, date_col="ts", now_col=F.col("now_ts"), days=cfg.old_delete_days
        )
        report.rows_rejected_old_delete = rejected.count()
        kept = kept.drop("now_ts")

        for tbl in [r["table_name"] for r in kept.select("table_name").distinct().collect()]:
            policy = REGISTRY.get(tbl, REGISTRY["events_state"])
            tslice = kept.filter(F.col("table_name") == tbl).drop("table_name")
            report.tables[tbl] = self._apply_table(tbl, policy, tslice)
            report.rows_applied += report.tables[tbl]["rows"]

        # ledger covers the FULL consumed slice (incl. F6-rejected rows —
        # they are consumed positions even though not applied), so the
        # resume point always advances and replays can't loop.
        self._write_ledger(batch)
        batch.unpersist()
        return report

    def _apply_table(self, tbl: str, policy: TablePolicy, tslice: DataFrame) -> dict:
        cfg = self.cfg
        if policy.apply_mode in ("append", "insert_as_update"):
            # hot path: versions append, partitioned monthly (O11); no
            # read of existing data, no shuffle beyond the write split
            out = apply_insert_as_update(tslice, policy.key_cols)
            out = out.withColumn("yyyymm", F.date_format("ts", "yyyyMM"))
            n = out.count()
            if not cfg.dry_run and n:
                (
                    out.coalesce(max(1, n // 500_000 + 1))  # bound file count (O9)
                    .write.mode("append")
                    .partitionBy("yyyymm")
                    .parquet(self.table_path(tbl))
                )
            return {"mode": policy.apply_mode, "rows": n}

        # mutate mode: fold batch into stored state.
        # Two-phase ordering (B2/O6) is inherent: the replay window takes
        # the LAST event per key, so appends can't overtake mutations.
        try:
            current = self.spark.read.parquet(self.table_path(tbl))
            base = current.withColumn("op", F.lit("I")).withColumn(
                "seq", F.lit(-1).cast("bigint")
            )
            merged = base.unionByName(tslice, allowMissingColumns=True)
        except Exception:
            merged = tslice
        new_state = apply_mutate(merged, policy.key_cols)
        n = new_state.count()
        if not cfg.dry_run:
            tmp = self.table_path(tbl) + "__staging"
            new_state.write.mode("overwrite").parquet(tmp)
            final = self.table_path(tbl)
            # atomic-ish swap (HDFS/object stores: use a manifest commit)
            import shutil

            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
        return {"mode": "mutate", "rows": n}

    def _write_ledger(self, batch: DataFrame) -> None:
        """S5 — one ledger row per (table, file) slice; dateid := the
        slice's max seq (structurally monotonic, see with_dateid)."""
        entries = (
            batch.groupBy("table_name", "file_seq")
            .agg(
                F.max("seq").alias("dateid"),
                F.max("ts").alias("log_time"),
                F.min("seq").alias("log_pos_start"),
                F.max("seq").alias("log_pos_end"),
                F.concat_ws(",", F.sort_array(F.collect_set("op"))).alias("sql_type"),
            )
            .select(
                "dateid",
                F.col("log_time").alias("created_at"),
                "table_name",
                "sql_type",
                "log_time",
                F.col("file_seq").alias("log_file"),
                "log_pos_start",
                "log_pos_end",
            )
        )
        if not self.cfg.dry_run:
            entries.coalesce(1).write.mode("append").parquet(self.ledger_path)

    # --- a full cron session: loop under a wall-clock budget, then
    # --- end-of-run maintenance (entry points A + C) -----------------------
    def run_session(
        self,
        changelog: DataFrame,
        max_minutes: float = 50.0,
        grace_minutes: float = 3.0,
        compact_months: list[int] | None = None,
        compact_tables: dict[str, list[str]] | None = None,
    ) -> list[RunReport]:
        """One cron invocation of the reference end-to-end: repeated
        micro-batches under a wall-clock budget, then gated maintenance.

        - B4 time cap: the reference stops its event loop after
          ``replication_max_minutes`` minus a 3-minute grace
          (matomo2clickhouse.py:187-193,688-722; _settings.py:82-84).
          Here each ``run_once`` is one bounded micro-batch; the loop
          stops at EOF (a run that applies/quarantines nothing) or when
          the next batch would start past the deadline.
        - Entry point C: end-of-run dedup compaction runs ONLY when
          ``max_minutes > 10`` (matomo2clickhouse.py:756; README.md:327)
          — short/test runs skip maintenance, exactly like the reference.
          ``compact_tables`` maps table -> key cols (defaults to every
          insert_as_update table's policy keys); ``compact_months`` is
          the O12 window (reference: 14->0 days ≈ current month).
        """
        import time as _time

        deadline = _time.monotonic() + 60.0 * max(0.0, max_minutes - grace_minutes)
        reports: list[RunReport] = []
        while _time.monotonic() < deadline:
            before = self.resume_seq()
            r = self.run_once(changelog)
            reports.append(r)
            # EOF = the resume point didn't advance. (Not "applied ==
            # 0": unfixed poison rows are re-quarantined EVERY run, like
            # the reference's poison statements — they must not keep the
            # session spinning until the deadline.)
            if self.resume_seq() == before:
                break
        if max_minutes > 10 and compact_months:
            targets = compact_tables or {
                name: None
                for name, pol in REGISTRY.items()
                if pol.apply_mode == "insert_as_update"
                and os.path.exists(self.table_path(name))
            }
            for tbl, keys in targets.items():
                self.compact_table(tbl, compact_months, keys=keys)
        return reports

    # --- maintenance: partition-scoped dedup compaction (Q3/O12) -----------
    def compact_table(
        self,
        tbl: str,
        months: list[int],
        keys: list[str] | None = None,
        version_col: str = "dateid",
    ) -> dict:
        """End-of-run dedup compaction, the write side of O12: inside the
        given ``yyyymm`` partitions keep only the latest version per key;
        every other partition is untouched BYTES — neither read nor
        rewritten.

        The reference runs this hourly as ``ALTER TABLE ... DELETE WHERE
        <date window> AND dateid IN (<superseded subquery>)`` with the
        window bounded to 14→0 days precisely so the mutation never scans
        the whole table (_settings.py:230-287,258,286; gate
        matomo2clickhouse.py:756-766). Here the window is the partition
        list: the read is partition-pruned (``yyyymm IN (...)`` lands in
        PartitionFilters, so out-of-window files are never opened), the
        deduped result is staged, and only the affected partition
        directories are swapped in — the object-store-safe equivalent of
        dynamic partition overwrite, same commit pattern as the mutate
        path. ``months`` are ints because parquet partition-type
        inference reads ``yyyymm=202403`` back as an integer column.

        Returns ``{"partitions", "rows_before", "rows_removed"}``.
        """
        policy = REGISTRY.get(tbl, REGISTRY["events_state"])
        if policy.apply_mode == "mutate":
            # mutate tables hold latest-state only — nothing to compact
            return {"partitions": [], "rows_before": 0, "rows_removed": 0}
        path = self.table_path(tbl)
        in_win = self.spark.read.parquet(path).filter(F.col("yyyymm").isin(months))
        # key override for fixture-shaped tables whose stored business key
        # differs from the matomo-shaped registry entry
        deduped = dedup_in_window(in_win, keys or policy.key_cols, version_col=version_col)
        n_before = in_win.count()
        n_after = deduped.count()
        stats = {
            "partitions": sorted(months),
            "rows_before": n_before,
            "rows_removed": n_before - n_after,
        }
        if self.cfg.dry_run:
            return stats
        staging = path + "__compact"
        deduped.write.mode("overwrite").partitionBy("yyyymm").parquet(staging)
        import shutil

        for m in months:
            src = os.path.join(staging, f"yyyymm={m}")
            dst = os.path.join(path, f"yyyymm={m}")
            if os.path.exists(src):
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                os.rename(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
        return stats
