"""Change-data-capture consumers over the commit log.

The commit log's manifest-diff change feed (``GraphStore.changes``)
gives row-level inserts/deletes between any two committed versions.
This module turns it into a DOWNSTREAM pipeline driver — the
micro-batch shape Structured Streaming's foreachBatch uses, without
needing a custom PySpark source: a follower polls the table's version
counter and hands each new version window's feed to a callback, and
``sync_mirror`` is the canonical callback (keep a second table
row-identical by applying deletes as key anti-joins and inserts as
blind appends — both partition-pruned on a bucketed mirror).

At 100 TB the feed is proportional to what CHANGED (manifest diffs
read only differing files; DV diffs read only covered files), so a
follower's steady-state cost is O(mutation size), never O(table).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.sources.materialize import GraphStore


def follow_changes(
    store: GraphStore,
    table: str,
    apply_fn: Callable[[DataFrame, int, int], None],
    from_version: int | None = None,
    poll_interval_s: float = 0.2,
    max_polls: int | None = None,
    stop_when_caught_up: bool = False,
) -> int:
    """Poll ``table``'s commit log and invoke ``apply_fn(feed, v_from,
    v_to)`` for each new committed window.  Feeds are exactly-once per
    version window as long as the caller records the returned watermark
    (the last applied version) and resumes from it.

    ``max_polls`` bounds the loop (testing / batch catch-up);
    ``stop_when_caught_up`` returns as soon as a poll finds no new
    version.  Returns the last applied version."""
    last = store.version(table) if from_version is None else from_version
    polls = 0
    while True:
        cur = store.version(table)
        if cur > last:
            feed = store.changes(table, last, cur)
            apply_fn(feed, last, cur)
            last = cur
        elif stop_when_caught_up:
            return last
        polls += 1
        if max_polls is not None and polls >= max_polls:
            return last
        time.sleep(poll_interval_s)


def sync_mirror(
    source_store: GraphStore,
    source_table: str,
    mirror_store: GraphStore,
    mirror_table: str,
    key_cols: list[str],
    from_version: int | None = None,
) -> int:
    """One catch-up step: make ``mirror_table`` reflect
    ``source_table``'s latest committed version by applying the change
    feed since ``from_version`` (defaults to the mirror's recorded
    watermark; first call full-copies).  Deletes apply as a
    partition-pruned key anti-join, inserts as a blind append — an
    update's delete+insert pair replaces the row.  Returns the new
    watermark version, recorded in the mirror's table meta."""
    meta = mirror_store._load_meta(mirror_table)
    watermark = (
        meta.get("cdc_watermark") if from_version is None else from_version
    )
    cur = source_store.version(source_table)
    if watermark is None:
        # initial hydration: snapshot copy at the current version
        mirror_store.copy_into(
            mirror_table,
            source_store.read(source_table, version=cur),
            primary_keys=key_cols,
        )
    elif cur > watermark:
        feed = source_store.changes(source_table, watermark, cur).cache()
        try:
            deletes = feed.filter(F.col("_change_type") == "delete").select(
                *key_cols
            )
            if not deletes.isEmpty():
                mirror_store.delete_where_in(mirror_table, key_cols, deletes)
            inserts = feed.filter(F.col("_change_type") == "insert").drop(
                "_change_type"
            )
            if not inserts.isEmpty():
                mirror_store.copy_into(
                    mirror_table, inserts, primary_keys=key_cols
                )
        finally:
            feed.unpersist()
    meta = mirror_store._load_meta(mirror_table)
    meta["cdc_watermark"] = cur
    mirror_store._save_meta(mirror_table, meta)
    return cur


def apply_changes(
    store: GraphStore,
    table: str,
    feed: DataFrame,
    keys: list[str],
    sequence_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
    merge_on_read: bool = False,
) -> dict:
    """Apply an EXTERNAL row-op CDC feed to ``table`` in one atomic
    commit — the Delta ``APPLY CHANGES INTO`` analog (the reference's
    connector sync batches, adapters/*/sync, carry the same
    (key, op, cursor) shape).

    ``feed`` rows are (key columns, value columns, ``op_col``,
    ``sequence_col``).  Per key only the HIGHEST-sequence row wins —
    out-of-order and superseded ops collapse away before anything
    touches the table — then the winners split into upserts
    (``op != delete_op``: update-or-insert by key) and deletes, both
    applied by a single ``merge_into`` commit, so readers see either
    none or all of the batch.  Sequence ties break deterministically:
    a delete outranks an upsert, then the md5 of the row's values —
    replaying the same feed always lands the same state (the
    exactly-once contract replayed micro-batches need).

    Scale shape: the winner-per-key reduction is one row_number window
    over the feed (shuffle on ``keys``, proportional to the BATCH, not
    the table); the merge itself is join-shaped and partition-pruned —
    with ``merge_on_read`` the table-side I/O is O(rows changed).

    Returns the merge counts plus ``{"ops": feed rows, "winners":
    rows after sequence collapse}``.
    """
    from pyspark.sql import Window

    missing = [c for c in (*keys, sequence_col, op_col) if c not in feed.columns]
    if missing:
        raise ValueError(f"CDC feed is missing columns {missing}")
    value_cols = [
        c for c in feed.columns if c not in (*keys, sequence_col, op_col)
    ]
    is_del = (F.col(op_col) == delete_op).cast("int")
    w = Window.partitionBy(*keys).orderBy(
        F.col(sequence_col).desc(),
        is_del.desc(),
        # concat_ws silently SKIPS nulls, so (NULL,'a') and ('a',NULL)
        # would concatenate identically and the tie would fall back to
        # nondeterministic ordering; make each column's null state
        # explicit so replaying the same feed always picks the same row
        F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                    for c in value_cols
                ],
            )
        ).desc(),
    )
    winners = (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .cache()
    )
    try:
        n_ops, n_winners = feed.count(), winners.count()
        upserts = winners.filter(F.col(op_col) != delete_op).drop(
            op_col, sequence_col
        )
        deletes = winners.filter(F.col(op_col) == delete_op).select(*keys)
        counts = store.merge_into(
            table,
            upserts,
            on=keys,
            delete_source=deletes,
            merge_on_read=merge_on_read,
        )
    finally:
        winners.unpersist()
    return {**counts, "ops": n_ops, "winners": n_winners}
