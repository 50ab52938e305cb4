"""Materialization: staging tables → graph tables (and back out).

Re-expresses the reference's COPY-based materialization
(/root/reference/robosystems/graph_api/routers/databases/tables/
materialize.py:42-487 and robosystems/operations/lbug/ingest.py:588-683):

- bulk load = append, never row-wise MERGE (the reference measured
  MERGE 40x slower and removed it from the bulk path)
- ``ignore_errors=true`` duplicate-tolerant COPY ≈ left-anti join of
  incoming rows against existing primary keys before append
- nodes are loaded before relationships (FK-like integrity,
  materialize.py:334-343)
- ``file_id`` provenance is stripped at materialization
- fork: copy all/selected tables parent → subgraph (S8)
- export: per-table parquet/csv backup (S7)

Mutation layout — the 100 TB answer without Delta/Iceberg (not
installable here): every PK-bearing table is hive-partitioned by
``rs_bucket = pmod(xxhash64(pk), n_buckets)``.  A point upsert/
update/delete then rewrites ONLY the bucket partitions that contain
affected rows (1/n_buckets of the table for a 1-row write) instead of
all 100 TB, and partition promotion uses a rename-aside protocol (live
dir moved to a Spark-invisible ``.trash`` before the new dir is
promoted) so a crash never leaves the table lost — worst case the
affected bucket sits in ``.trash`` for manual recovery.  On a real
deployment each table is a Delta/Iceberg table and these become
``MERGE``/``UPDATE``/``DELETE`` with the same pruning.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Another writer holds (or contended for) the table's write lock."""


class _TableLock:
    """Per-table writer mutex on a shared filesystem.

    ``os.open(..., O_CREAT | O_EXCL)`` is atomic on POSIX and on every
    object-store FUSE/NFS layer that honors exclusive create, so it
    serializes writers across threads AND processes with no external
    coordinator — the same role Delta's transaction-log CAS plays.

    Liveness/safety details:
    - the HOLDER heartbeats the lock file's mtime (daemon thread,
      every ``stale_s/4``), so a long mutation never looks stale —
      only a genuinely dead writer's lock ages past ``stale_s``;
    - a stale lock is broken by RENAMING it aside to a unique name
      (never unlink): of two racing breakers exactly one rename
      succeeds, and a fresh lock re-created after a break can never be
      destroyed by the loser's stale decision;
    - each lock file carries a random owner token; ``release`` unlinks
      only if the token still matches, so a broken-and-superseded
      holder cannot delete its successor's lock.  (The commit log's
      O_EXCL CAS remains the final arbiter if exclusion is ever
      violated.)  A crashed writer's in-flight rewrite is recoverable
      from ``.trash`` (see ``_swap_dir``)."""

    def __init__(self, path: str, timeout_s: float = 120.0, stale_s: float = 300.0):
        self.path = path
        self.timeout_s = timeout_s
        self.stale_s = stale_s
        self._token: str | None = None
        self._hb_stop = None  # threading.Event while held

    def _write_lockfile(self, fd: int) -> None:
        import secrets

        self._token = secrets.token_hex(8)
        os.write(
            fd,
            json.dumps(
                {"pid": os.getpid(), "ts": time.time(), "token": self._token}
            ).encode(),
        )
        os.close(fd)

    def _start_heartbeat(self) -> None:
        import threading

        self._hb_stop = threading.Event()
        interval = max(self.stale_s / 4.0, 0.05)
        path, stop = self.path, self._hb_stop

        def _beat() -> None:
            while not stop.wait(interval):
                try:
                    now = time.time()
                    os.utime(path, (now, now))
                except OSError:
                    return  # lock broken/released under us — stop beating

        t = threading.Thread(target=_beat, daemon=True, name="table-lock-heartbeat")
        t.start()

    def acquire(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                self._write_lockfile(fd)
                self._start_heartbeat()
                return
            except FileExistsError:
                try:
                    age = time.time() - os.stat(self.path).st_mtime
                    if age > self.stale_s:
                        # dead writer (no heartbeat for stale_s): break
                        # by rename-aside — atomic, single-winner, and
                        # incapable of destroying a re-created lock
                        aside = f"{self.path}.stale.{os.getpid()}.{time.monotonic_ns()}"
                        try:
                            os.rename(self.path, aside)
                            os.unlink(aside)
                        except FileNotFoundError:
                            pass  # another breaker won — just retry
                        continue
                except FileNotFoundError:
                    continue  # released between open and stat — retry now
                if time.monotonic() >= deadline:
                    raise ConcurrentWriteError(
                        f"timed out after {self.timeout_s}s waiting for write "
                        f"lock {self.path}"
                    ) from None
                time.sleep(0.05)

    def release(self) -> None:
        if self._hb_stop is not None:
            self._hb_stop.set()
            self._hb_stop = None
        token, self._token = self._token, None
        try:
            with open(self.path) as fh:
                current = json.load(fh).get("token")
            if current == token:
                os.unlink(self.path)
            # else: our lock was broken and superseded — leave the
            # successor's lock alone
        except (OSError, ValueError):
            pass

    def __enter__(self) -> "_TableLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()

# Partition column for PK-hash bucketing.  No leading underscore:
# Spark's file index hides paths starting with ``_`` or ``.``, so an
# ``_bucket=N`` partition dir would be invisible to reads.
BUCKET_COL = "rs_bucket"
DEFAULT_BUCKETS = 64


def _bucket_expr(keys: list[str], n_buckets: int) -> Column:
    """Deterministic bucket id from the PK columns (engine-stable:
    xxhash64 of the unit-separator-joined key string)."""
    key_str = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return F.pmod(F.xxhash64(key_str), F.lit(n_buckets)).cast("int")


def _swap_dir(live: str, tmp: str, trash_root: str) -> None:
    """Promote ``tmp`` over ``live`` without an unrecoverable window:
    live is renamed aside into ``trash_root`` first, then tmp is
    promoted, then the trash entry is dropped.  A crash mid-way leaves
    the previous data recoverable in trash instead of rmtree'd."""
    os.makedirs(trash_root, exist_ok=True)
    aside = os.path.join(trash_root, os.path.basename(live))
    if os.path.exists(aside):
        shutil.rmtree(aside)
    if os.path.exists(live):
        os.rename(live, aside)
    if os.path.exists(tmp):
        os.rename(tmp, live)
    if os.path.exists(aside):
        shutil.rmtree(aside)


class GraphStore:
    """A graph database: one parquet table dir per node/rel table,
    PK-hash-bucket partitioned so point mutations are partition-pruned."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        graph_id: str,
        n_buckets: int = DEFAULT_BUCKETS,
        lock_timeout_s: float = 120.0,
        lock_stale_s: float = 300.0,
    ):
        self.spark = spark
        self.root = root
        self.graph_id = graph_id
        self.n_buckets = n_buckets
        self.lock_timeout_s = lock_timeout_s
        self.lock_stale_s = lock_stale_s
        os.makedirs(self.graph_path, exist_ok=True)

    @property
    def graph_path(self) -> str:
        return os.path.join(self.root, self.graph_id)

    def table_path(self, table: str) -> str:
        return os.path.join(self.graph_path, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(self.table_path(table))

    def tables(self) -> list[str]:
        if not os.path.exists(self.graph_path):
            return []
        return sorted(
            d for d in os.listdir(self.graph_path)
            if os.path.isdir(os.path.join(self.graph_path, d))
            and not d.startswith(("_", "."))
        )

    # -- bucket metadata ----------------------------------------------------

    def _meta_path(self, table: str) -> str:
        return os.path.join(self.table_path(table), ".meta.json")

    def _load_meta(self, table: str) -> dict:
        try:
            with open(self._meta_path(table)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _save_meta(self, table: str, meta: dict) -> None:
        os.makedirs(self.table_path(table), exist_ok=True)
        with open(self._meta_path(table), "w") as fh:
            json.dump(meta, fh)

    # -- write coordination (the Delta-stand-in transaction log) ------------
    #
    # Every mutation runs under a per-table writer mutex and appends a
    # versioned commit record.  This closes the concurrent-writer gap of
    # the bucket-partitioned layout: without it, two simultaneous
    # upserts could interleave their read-compute-swap cycles and lose
    # one writer's rows.  What real Delta adds beyond this is
    # manifest-pinned SNAPSHOT READS; here readers are read-committed
    # (they see each bucket swap as it lands) — documented in SCALE.md.
    # The log lives OUTSIDE the table dir (which rewrites swap out
    # wholesale) under ``<graph>/.txn/<table>/``.

    def _txn_dir(self, table: str) -> str:
        return os.path.join(self.graph_path, ".txn", table)

    def _write_lock(self, table: str) -> _TableLock:
        return _TableLock(
            os.path.join(self._txn_dir(table), "LOCK"),
            timeout_s=self.lock_timeout_s,
            stale_s=self.lock_stale_s,
        )

    def _ckpt_path(self, table: str) -> str:
        return os.path.join(self._txn_dir(table), "ckpt.json")

    def _load_ckpt(self, table: str) -> dict:
        try:
            with open(self._ckpt_path(table)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {"last_v": 0, "records": []}

    def version(self, table: str) -> int:
        """Latest committed version of ``table`` (0 = never written)."""
        try:
            names = os.listdir(self._txn_dir(table))
        except FileNotFoundError:
            return 0
        versions = [
            int(n[1:-5])  # full digit run: v00000001.json and beyond 8 digits
            for n in names
            if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
        ]
        return max(max(versions, default=0), self._load_ckpt(table)["last_v"])

    def history(self, table: str) -> list[dict]:
        """Retained commit log of ``table``, oldest first (checkpointed
        records followed by the per-commit files after the checkpoint;
        records beyond CHECKPOINT_MAX_RECORDS ago have been discarded
        by log retention — the checkpoint's ``truncated`` counter says
        how many)."""
        d = self._txn_dir(table)
        ckpt = self._load_ckpt(table)
        out = list(ckpt["records"])
        for v in range(ckpt["last_v"] + 1, self.version(table) + 1):
            try:
                with open(os.path.join(d, f"v{v:08d}.json")) as fh:
                    out.append(json.load(fh))
            except (OSError, ValueError):
                continue
        return out

    # One metadata file per commit is fine for thousands of commits but
    # not for a long-lived 100 TB table taking millions — the same
    # problem Delta solves with log checkpoints.  Every AUTO_CKPT-th
    # commit folds records older than the last ``keep_last`` into
    # ckpt.json and unlinks their files, keeping the log O(keep_last)
    # FILES; the checkpoint itself retains only the newest
    # CHECKPOINT_MAX_RECORDS folded records (like Delta's log
    # retention, ancient history is discarded, not kept forever), so
    # total metadata and history() memory stay bounded too.
    AUTO_CHECKPOINT_EVERY = 256
    CHECKPOINT_KEEP_LAST = 64
    CHECKPOINT_MAX_RECORDS = 4096

    def checkpoint_history(self, table: str, keep_last: int | None = None) -> int:
        """Fold commit records older than the newest ``keep_last`` into
        the checkpoint file and remove their per-commit files.  Runs
        under the caller's write lock (``_commit`` auto-invokes it) or
        standalone via its own lock.  Returns records folded."""
        keep = self.CHECKPOINT_KEEP_LAST if keep_last is None else keep_last
        cut = self.version(table) - keep
        ckpt = self._load_ckpt(table)
        if cut <= ckpt["last_v"]:
            return 0
        d = self._txn_dir(table)
        folded = 0
        records = list(ckpt["records"])
        for v in range(ckpt["last_v"] + 1, cut + 1):
            path = os.path.join(d, f"v{v:08d}.json")
            try:
                with open(path) as fh:
                    records.append(json.load(fh))
            except (OSError, ValueError):
                pass
        dropped = max(len(records) - self.CHECKPOINT_MAX_RECORDS, 0)
        records = records[dropped:]
        # write-then-rename so a crash never leaves a torn checkpoint,
        # THEN unlink the folded files (re-folding survivors is idempotent)
        tmp = self._ckpt_path(table) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "last_v": cut,
                    "records": records,
                    "truncated": ckpt.get("truncated", 0) + dropped,
                },
                fh,
            )
        os.replace(tmp, self._ckpt_path(table))
        for v in range(ckpt["last_v"] + 1, cut + 1):
            try:
                os.unlink(os.path.join(d, f"v{v:08d}.json"))
                folded += 1
            except FileNotFoundError:
                pass
        return folded

    def _commit(self, table: str, op: str, detail: dict | None = None) -> int:
        """Append the next commit record via exclusive create — the
        same CAS Delta performs on its log; under the writer lock the
        create cannot legitimately collide, so a collision means lock
        discipline was violated (e.g. a stale-lock takeover raced a
        live writer) and the mutation must not be recorded as won."""
        os.makedirs(self._txn_dir(table), exist_ok=True)
        v = self.version(table) + 1
        record = {
            "v": v,
            "op": op,
            "table": table,
            "ts": time.time(),
            "pid": os.getpid(),
            "detail": detail or {},
        }
        path = os.path.join(self._txn_dir(table), f"v{v:08d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"commit conflict on {table!r} v{v} — concurrent writer"
            ) from None
        with os.fdopen(fd, "w") as fh:
            json.dump(record, fh)
        if v % self.AUTO_CHECKPOINT_EVERY == 0:
            self.checkpoint_history(table)
        return v

    def _bucket_dirs(self, table: str) -> list[str]:
        path = self.table_path(table)
        if not os.path.isdir(path):
            return []
        return sorted(
            d for d in os.listdir(path) if d.startswith(f"{BUCKET_COL}=")
        )

    def _is_bucketed(self, table: str) -> bool:
        return bool(self._bucket_dirs(table))

    def _read_raw(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(table))

    def read(self, table: str) -> DataFrame:
        df = self._read_raw(table)
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def create_table(
        self, table: str, schema, primary_keys: list[str] | None = None
    ) -> None:
        """CREATE TABLE: a zero-row parquet table with the declared
        StructType, so reads see the right schema before the first
        COPY (the DDL path, schema/ddl.py).  Bucket keys are recorded
        now; the physical partition layout appears with the first
        non-empty copy_into."""
        with self._write_lock(table):
            if self.exists(table):
                raise ValueError(f"Table {table!r} already exists")
            keys = [k for k in (primary_keys or []) if k in schema.fieldNames()]
            empty = self.spark.createDataFrame([], schema)
            empty.write.mode("overwrite").parquet(self.table_path(table))
            self._save_meta(table, {"bucket_keys": keys, "n_buckets": self.n_buckets})
            self._commit(table, "create_table", {"keys": keys})

    def drop_table(self, table: str) -> None:
        """DROP TABLE: move the table dir aside then delete (same
        rename-aside discipline as rewrites — readers holding the old
        path fail fast rather than seeing partial deletes)."""
        with self._write_lock(table):
            if not self.exists(table):
                raise ValueError(f"Table {table!r} does not exist")
            self._clean_scratch(table)
            os.makedirs(self._trash_root, exist_ok=True)
            os.rename(self.table_path(table), self._trash_for(table))
            self._clean_scratch(table)
            self._commit(table, "drop_table")

    # -- load paths ---------------------------------------------------------

    def copy_into(
        self,
        table: str,
        df: DataFrame,
        primary_keys: list[str] | None = None,
        ignore_errors: bool = False,
    ) -> int:
        """Bulk COPY semantics: append all rows; with ``ignore_errors``
        drop incoming rows whose PK already exists (duplicate-tolerant
        load) via a left-anti join — the scalable MERGE-free path.

        Returns rows loaded.
        """
        with self._write_lock(table):
            n = self._copy_into_unlocked(table, df, primary_keys, ignore_errors)
            self._commit(table, "copy_into", {"rows": n})
            return n

    def _copy_into_unlocked(
        self,
        table: str,
        df: DataFrame,
        primary_keys: list[str] | None = None,
        ignore_errors: bool = False,
    ) -> int:
        if "file_id" in df.columns:
            df = df.drop("file_id")
        if ignore_errors and primary_keys and self.exists(table):
            existing = self.read(table).select(*primary_keys)
            df = df.join(existing, primary_keys, "left_anti")

        is_new = not self.exists(table)
        if is_new:
            keys = [k for k in (primary_keys or []) if k in df.columns]
            self._save_meta(
                table, {"bucket_keys": keys, "n_buckets": self.n_buckets}
            )
        meta = self._load_meta(table)
        keys = [k for k in meta.get("bucket_keys", []) if k in df.columns]
        replace_empty = False
        if not is_new:
            if self._is_bucketed(table):
                if len(keys) != len(meta.get("bucket_keys", [])):
                    raise ValueError(
                        f"append to bucketed table {table!r} is missing bucket "
                        f"key columns {meta.get('bucket_keys')}"
                    )
                # Align types to the stored schema: appended files must
                # read together with every existing partition.
                stored = {f.name: f.dataType for f in self._read_raw(table).schema.fields}
                df = df.select(
                    *[
                        F.col(c).cast(stored[c]).alias(c) if c in stored else F.col(c)
                        for c in df.columns
                    ]
                )
            elif keys and self._read_raw(table).isEmpty():
                # A DDL-declared (or fully-emptied) table: adopt the
                # declared bucket keys and DECLARED TYPES, replacing the
                # schema-only empty files with the partitioned layout.
                stored = {f.name: f.dataType for f in self._read_raw(table).schema.fields}
                df = df.select(
                    *[
                        F.col(c).cast(stored[c]).alias(c) if c in stored else F.col(c)
                        for c in df.columns
                    ]
                )
                replace_empty = True
            else:
                # Layout lost its partitioning (e.g. legacy rewrite with
                # surviving rows): never mix plain files with partition
                # dirs in one table dir.
                keys = []

        df = df.cache()
        n = df.count()
        writer = df
        mode = "overwrite" if replace_empty else "append"
        if keys:
            writer = df.withColumn(
                BUCKET_COL, _bucket_expr(keys, meta.get("n_buckets", self.n_buckets))
            )
            writer.write.mode(mode).partitionBy(BUCKET_COL).parquet(
                self.table_path(table)
            )
        else:
            writer.write.mode(mode).parquet(self.table_path(table))
        if replace_empty:
            # overwrite cleared the table dir, .meta.json included
            self._save_meta(table, meta)
        df.unpersist()
        return n

    def upsert(self, table: str, df: DataFrame, primary_keys: list[str]) -> None:
        """Point-upsert (Cypher MERGE analog, save_view.py writebacks).

        On a bucketed table whose bucket keys match ``primary_keys``
        the merge touches only the partitions containing incoming keys
        (Delta ``MERGE INTO`` + pruning in production).  Falls back to
        an atomic full rewrite otherwise.  Kept off the bulk path per
        the reference's 40x MERGE measurement.
        """
        with self._write_lock(table):
            self._upsert_unlocked(table, df, primary_keys)
            self._commit(table, "upsert", {"keys": primary_keys})

    def _upsert_unlocked(
        self, table: str, df: DataFrame, primary_keys: list[str]
    ) -> None:
        if not self.exists(table):
            self._copy_into_unlocked(table, df, primary_keys=primary_keys)
            return
        meta = self._load_meta(table)
        if self._is_bucketed(table) and sorted(meta.get("bucket_keys", [])) == sorted(
            primary_keys
        ):
            n_buckets = meta.get("n_buckets", self.n_buckets)
            # Align incoming column types to the stored schema: a pruned
            # rewrite touches only some partitions, so letting union
            # widen types (int -> bigint) would leave the table with
            # per-partition schemas that no longer read together.
            stored = {f.name: f.dataType for f in self._read_raw(table).schema.fields}
            aligned = df.select(
                *[
                    F.col(c).cast(stored[c]).alias(c) if c in stored else F.col(c)
                    for c in df.columns
                ]
            )
            incoming = aligned.withColumn(
                BUCKET_COL, _bucket_expr(meta["bucket_keys"], n_buckets)
            ).cache()
            buckets = [r[0] for r in incoming.select(BUCKET_COL).distinct().collect()]
            existing = self._read_raw(table).filter(F.col(BUCKET_COL).isin(buckets))
            merged = existing.join(
                incoming.select(*primary_keys), primary_keys, "left_anti"
            ).unionByName(incoming, allowMissingColumns=True)
            self._rewrite_buckets(table, merged, buckets)
            incoming.unpersist()
            return
        existing = self.read(table)
        merged = existing.join(
            df.select(*primary_keys), primary_keys, "left_anti"
        ).unionByName(df, allowMissingColumns=True)
        self._rewrite(table, merged)

    def update_where(self, table: str, condition, assignments: dict) -> int:
        """UPDATE ... SET ... WHERE (the Cypher SET analog,
        save_view.py:180-199 update_report_metadata).  ``assignments``
        maps column -> Column/literal.  Rewrites only the bucket
        partitions containing matching rows.  Returns rows updated.

        The condition is materialized ONCE into a temp column before
        any assignment applies, so every SET sees pre-update values
        (SQL UPDATE semantics) even when the condition references an
        assigned column."""
        with self._write_lock(table):
            n = self._update_where_unlocked(table, condition, assignments)
            self._commit(table, "update_where", {"rows": n})
            return n

    def _update_where_unlocked(self, table: str, condition, assignments: dict) -> int:
        raw = self._read_raw(table)
        # collision-checked temp name: a user table may itself have a
        # "_match" column, which must survive the update untouched
        match_col = "_match"
        while match_col in raw.columns:
            match_col += "_"
        raw = raw.withColumn(match_col, F.coalesce(condition, F.lit(False)))
        bucketed = BUCKET_COL in raw.columns

        if bucketed:
            hits = (
                raw.filter(F.col(match_col))
                .groupBy(BUCKET_COL)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            buckets = [r[BUCKET_COL] for r in hits]
            n = sum(r["n"] for r in hits)
            if not buckets:
                return 0
            raw = raw.filter(F.col(BUCKET_COL).isin(buckets))
        else:
            n = raw.filter(F.col(match_col)).count()

        updated = raw
        for col_name, value in assignments.items():
            value_col = value if isinstance(value, Column) else F.lit(value)
            # SET may introduce a new property: non-matching rows get
            # NULL for it (Cypher property-add semantics)
            prior = (
                F.col(col_name)
                if col_name in updated.columns
                else F.lit(None)
            )
            updated = updated.withColumn(
                col_name,
                F.when(F.col(match_col), value_col).otherwise(prior),
            )
        updated = updated.drop(match_col)
        if bucketed:
            self._rewrite_buckets(table, updated, buckets)
        else:
            self._rewrite(table, updated)
        return n

    def delete_where(self, table: str, condition) -> int:
        """DELETE ... WHERE (DETACH DELETE analog, save_view.py:121-143).

        Rows where the condition is NULL are kept (SQL DELETE deletes
        only WHERE-true rows).  Bucketed tables rewrite only the
        partitions that contain deleted rows."""
        with self._write_lock(table):
            n = self._delete_where_unlocked(table, condition)
            self._commit(table, "delete_where", {"rows": n})
            return n

    def _delete_where_unlocked(self, table: str, condition) -> int:
        cond = F.coalesce(condition, F.lit(False))
        raw = self._read_raw(table)

        if BUCKET_COL in raw.columns:
            hits = (
                raw.filter(cond)
                .groupBy(BUCKET_COL)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            buckets = [r[BUCKET_COL] for r in hits]
            removed = sum(r["n"] for r in hits)
            if not buckets:
                return 0
            kept = raw.filter(F.col(BUCKET_COL).isin(buckets)).filter(~cond)
            self._rewrite_buckets(table, kept, buckets)
            return removed

        df = raw.cache()
        before = df.count()
        kept = df.filter(~cond)
        kept_count = kept.count()
        self._rewrite(table, kept)
        # unpersist AFTER the rewrite so the write is served from cache,
        # and so later reads of the path don't hit the stale cached plan
        df.unpersist()
        return before - kept_count

    # -- rewrite plumbing ---------------------------------------------------

    @property
    def _tmp_root(self) -> str:
        return os.path.join(self.graph_path, ".tmp")

    @property
    def _trash_root(self) -> str:
        return os.path.join(self.graph_path, ".trash")

    # Scratch (tmp + trash) is scoped PER TABLE: with per-table writer
    # locks, mutations of different tables run concurrently, so a
    # graph-wide rmtree here would delete another writer's in-flight
    # tmp or crash-recovery trash.

    def _tmp_for(self, table: str) -> str:
        return os.path.join(self._tmp_root, table)

    def _trash_for(self, table: str) -> str:
        return os.path.join(self._trash_root, table)

    def _clean_scratch(self, table: str | None = None) -> None:
        if table is None:
            dirs = [self._tmp_root, self._trash_root]
        else:
            dirs = [
                self._tmp_for(table),
                self._tmp_for(table) + "__empty",
                self._trash_for(table),
            ]
        for d in dirs:
            if os.path.exists(d):
                shutil.rmtree(d)
        if table is not None:
            # drop the shared roots only once empty (another table's
            # writer may still have scratch in flight)
            for root in (self._tmp_root, self._trash_root):
                try:
                    os.rmdir(root)
                except OSError:
                    pass

    def _rewrite(self, table: str, df: DataFrame) -> None:
        """Atomic full-table rewrite: write to a hidden tmp dir, move
        live aside to trash, promote, drop trash."""
        self._clean_scratch(table)
        meta = self._load_meta(table)
        tmp = self._tmp_for(table)
        df.write.mode("overwrite").parquet(tmp)
        _swap_dir(self.table_path(table), tmp, self._trash_for(table))
        # Meta is immutable PK config; the physical layout (now
        # unpartitioned) is derived via _is_bucketed, and restore can
        # re-bucket from the retained keys.
        if meta:
            self._save_meta(table, meta)
        self._clean_scratch(table)

    def _rewrite_buckets(
        self, table: str, df: DataFrame, buckets: list[int]
    ) -> None:
        """Rewrite ONLY the named bucket partitions from ``df`` (which
        must contain exactly those buckets' surviving rows, with the
        bucket column).  Each partition dir is promoted via the
        rename-aside protocol; a bucket absent from ``df`` (fully
        deleted) has its live dir removed."""
        self._clean_scratch(table)
        live = self.table_path(table)
        tmp = self._tmp_for(table)
        df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        for b in buckets:
            part = f"{BUCKET_COL}={b}"
            _swap_dir(
                os.path.join(live, part), os.path.join(tmp, part), self._trash_for(table)
            )
        if not self._bucket_dirs(table):
            # Every partition was deleted: leave a readable empty table
            # (schema-only parquet) rather than a bare dir Spark can't read.
            meta = self._load_meta(table)
            empty = self.spark.createDataFrame([], df.drop(BUCKET_COL).schema)
            tmp2 = self._tmp_for(table) + "__empty"
            empty.write.mode("overwrite").parquet(tmp2)
            _swap_dir(live, tmp2, self._trash_for(table))
            if meta:
                self._save_meta(table, meta)
        self._clean_scratch(table)

    # -- orchestration ------------------------------------------------------

    def materialize(
        self,
        staged: dict[str, DataFrame],
        node_tables: list[str],
        rel_tables: list[str],
        pk_map: dict[str, list[str]] | None = None,
        ignore_errors: bool = True,
    ) -> dict[str, int]:
        """Load a batch of staged tables, nodes before relationships."""
        pk_map = pk_map or {}
        loaded: dict[str, int] = {}
        for t in list(node_tables) + list(rel_tables):
            if t not in staged:
                continue
            pks = pk_map.get(t) or (["identifier"] if t in node_tables else ["src", "dst"])
            loaded[t] = self.copy_into(t, staged[t], primary_keys=pks, ignore_errors=ignore_errors)
        return loaded

    def fork(self, target_graph_id: str, tables: list[str] | None = None) -> "GraphStore":
        """Cross-database fork: copy tables parent → subgraph
        (materialize.py:241-487), nodes-first ordering preserved by
        the caller's table list.  File-level copy preserves the bucket
        layout and metadata (an object store would server-side copy)."""
        child = GraphStore(
            self.spark,
            self.root,
            target_graph_id,
            self.n_buckets,
            lock_timeout_s=self.lock_timeout_s,
            lock_stale_s=self.lock_stale_s,
        )
        for t in tables or self.tables():
            with child._write_lock(t):
                dest = child.table_path(t)
                if os.path.exists(dest):
                    shutil.rmtree(dest)
                shutil.copytree(self.table_path(t), dest)
                child._commit(t, "fork", {"from": self.graph_id})
        return child

    def restore(self, backup_dir: str, tables: list[str] | None = None) -> list[str]:
        """Restore tables from a parquet export (backup.py:110-365
        restore path): each backed-up table dir replaces the live one
        atomically; tables with bucket metadata are re-bucketed so
        post-restore mutations stay partition-pruned."""
        names = tables or sorted(
            d for d in os.listdir(backup_dir)
            if os.path.isdir(os.path.join(backup_dir, d))
        )
        restored = []
        for t in names:
            with self._write_lock(t):
                df = self.spark.read.parquet(os.path.join(backup_dir, t))
                meta = self._load_meta(t)
                keys = [k for k in meta.get("bucket_keys", []) if k in df.columns]
                if keys:
                    n_buckets = meta.get("n_buckets", self.n_buckets)
                    self._clean_scratch(t)
                    tmp = self._tmp_for(t)
                    df.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets)).write.mode(
                        "overwrite"
                    ).partitionBy(BUCKET_COL).parquet(tmp)
                    _swap_dir(self.table_path(t), tmp, self._trash_for(t))
                    self._save_meta(t, meta)
                    self._clean_scratch(t)
                else:
                    self._rewrite(t, df)
                self._commit(t, "restore", {"from": backup_dir})
            restored.append(t)
        return restored

    def export(self, out_dir: str, fmt: str = "parquet") -> dict[str, str]:
        """Full-database export (backup_manager.py:577-760): every
        table to parquet or csv under ``out_dir``."""
        out: dict[str, str] = {}
        for t in self.tables():
            dest = os.path.join(out_dir, t)
            df = self.read(t)
            if fmt == "parquet":
                df.write.mode("overwrite").parquet(dest)
            elif fmt == "csv":
                df.write.mode("overwrite").option("header", "true").csv(dest)
            else:
                raise ValueError(f"Unsupported export format: {fmt!r}")
            out[t] = dest
        return out
