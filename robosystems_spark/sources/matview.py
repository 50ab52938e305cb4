"""Incremental materialized views over GraphStore tables.

The reference's analytics views (trial balance, fact grids —
/root/reference/robosystems/operations/views/trial_balance.py:36-57,
fact_grid_builder.py:24-295) recompute on every request; at 100 TB a
per-request full aggregate is not viable.  This module maintains an
aggregate view INCREMENTALLY from the commit log's row-level change
feed (``GraphStore.changes``, the Delta-CDF analog):

- **additive mode** (every aggregate is ``sum``/``count``): the refresh
  reads ONLY the change feed — inserts add, deletes subtract — and
  merges per-group deltas into the view.  The source table is never
  scanned.  O(changed rows) I/O per refresh.
- **recompute mode** (``min``/``max``/``avg`` present — not invertible
  under deletes): the refresh finds the DISTINCT affected group keys in
  the feed and re-aggregates only those groups via a semi-join on the
  source.  O(affected groups' rows), never O(table).

The view itself is a bucketed GraphStore table keyed by the group
columns, so the per-refresh upsert/delete is partition-pruned, and the
view is snapshot-isolated/time-travelable like any other table.  View
metadata (source, spec, last maintained source version) lives in the
view table's meta, so maintenance survives process restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.sources.materialize import GraphStore

# internal per-group row count: additive views need it to detect
# emptied groups; kept as a visible (documented) column
ROWCOUNT_COL = "rs_rows"

_ADDITIVE_FNS = {"sum", "count"}
_ALL_FNS = {"sum", "count", "min", "max", "avg"}


def _agg_exprs(aggs: dict[str, tuple[str, str]]) -> list:
    out = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            expr = (
                F.count(F.lit(1)) if col == "*" else F.count(F.col(col))
            )
        else:
            expr = getattr(F, fn)(F.col(col))
        out.append(expr.alias(name))
    return out


def _validate(aggs: dict[str, tuple[str, str]]) -> str:
    for name, (fn, col) in aggs.items():
        if fn not in _ALL_FNS:
            raise ValueError(
                f"aggregate {name!r} uses unsupported fn {fn!r} "
                f"(supported: {sorted(_ALL_FNS)})"
            )
        if fn != "count" and col == "*":
            raise ValueError(f"aggregate {name!r}: '*' is only valid for count")
        if name == ROWCOUNT_COL:
            raise ValueError(f"{ROWCOUNT_COL!r} is reserved for the view itself")
    additive = all(fn in _ADDITIVE_FNS for fn, _ in aggs.values())
    return "additive" if additive else "recompute"


def create_materialized_view(
    store: GraphStore,
    view: str,
    source: str,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
) -> dict:
    """Materialize ``SELECT group_by, aggs FROM source GROUP BY
    group_by`` as table ``view`` and register it for incremental
    maintenance.  ``aggs`` maps output column -> (fn, source column),
    fn in {sum, count, min, max, avg} ('*' allowed for count).
    Returns the view metadata."""
    mode = _validate(aggs)
    if store.exists(view):
        raise ValueError(f"view table {view!r} already exists")
    base_v = store.version(source)
    src = store.read(source)
    full = src.groupBy(*group_by).agg(
        *_agg_exprs(aggs), F.count(F.lit(1)).alias(ROWCOUNT_COL)
    )
    store.copy_into(view, full, primary_keys=list(group_by))
    meta = store._load_meta(view)
    meta["matview"] = {
        "source": source,
        "group_by": list(group_by),
        "aggs": {k: list(v) for k, v in aggs.items()},
        "mode": mode,
        "last_v": base_v,
    }
    store._save_meta(view, meta)
    return meta["matview"]


def refresh_materialized_view(store: GraphStore, view: str) -> dict:
    """Advance ``view`` to the source's latest committed version using
    the row-level change feed.  Returns {"mode", "from_v", "to_v",
    "groups_touched"}; a no-op refresh returns groups_touched=0."""
    meta = store._load_meta(view)
    if meta.get("tb_matview"):
        # join-shaped trial-balance view: dispatch to its maintainer
        # (kept in views/ beside the full-recompute it mirrors) and
        # normalize the result to this function's contract
        from robosystems_spark.views.trial_balance import (
            refresh_trial_balance_matview,
        )

        r = refresh_trial_balance_matview(store, view)
        return {
            "mode": r["mode"],
            "from_v": 0,
            "to_v": store.version(view),
            "groups_touched": r["groups_touched"],
        }
    mv = meta.get("matview")
    if not mv:
        raise ValueError(f"table {view!r} is not a materialized view")
    source, group_by = mv["source"], mv["group_by"]
    aggs = {k: tuple(v) for k, v in mv["aggs"].items()}
    from_v, to_v = mv["last_v"], store.version(source)
    result = {"mode": mv["mode"], "from_v": from_v, "to_v": to_v, "groups_touched": 0}
    if to_v <= from_v:
        return result
    feed = store.changes(source, from_v, to_v)
    if mv["mode"] == "additive":
        touched = _refresh_additive(store, view, group_by, aggs, feed)
    else:
        touched = _refresh_recompute(store, view, source, group_by, aggs, feed)
    mv["last_v"] = to_v
    meta = store._load_meta(view)  # re-load: upserts rewrote table meta
    meta["matview"] = mv
    store._save_meta(view, meta)
    result["groups_touched"] = touched
    return result


def _refresh_additive(
    store: GraphStore,
    view: str,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    feed: DataFrame,
) -> int:
    """Delta-merge: the feed alone determines the new group values —
    the source table is never read.  sum adds signed values; count
    adds signed presence.  Groups whose row count reaches 0 are
    deleted from the view."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    deltas = []
    for name, (fn, col) in aggs.items():
        if fn == "sum":
            deltas.append(F.sum(sign * F.coalesce(F.col(col), F.lit(0))).alias(name))
        else:  # count
            present = (
                F.lit(1)
                if col == "*"
                else F.when(F.col(col).isNotNull(), 1).otherwise(0)
            )
            deltas.append(F.sum(sign * present).alias(name))
    delta = feed.groupBy(*group_by).agg(
        *deltas, F.sum(sign).alias(ROWCOUNT_COL)
    )
    return apply_additive_delta(store, view, group_by, list(aggs), delta)


def apply_additive_delta(
    store: GraphStore,
    view: str,
    group_by: list[str],
    agg_names: list[str],
    delta: DataFrame,
) -> int:
    """Merge a per-group SIGNED delta frame (columns: group_by +
    agg_names + ROWCOUNT_COL) into the view table: existing groups add,
    new groups insert, groups whose row count reaches 0 delete.
    O(changed groups) — the semi-join prunes the view read to touched
    buckets.  Shared by the single-table additive refresh above and
    join-shaped views (views/trial_balance.py's matview) that build
    their delta from a pre-joined change feed."""
    delta = delta.cache()
    touched = delta.count()
    if touched == 0:
        delta.unpersist()
        return 0

    existing = store.read(view)
    # only the touched groups are read back (semi-join prunes buckets),
    # merged with the deltas, and upserted/deleted — O(changed groups)
    current = existing.join(delta.select(*group_by), group_by, "left_semi")
    d = delta.select(
        *group_by,
        *[F.col(n).alias(f"_d_{n}") for n in agg_names],
        F.col(ROWCOUNT_COL).alias(f"_d_{ROWCOUNT_COL}"),
    )
    merged = current.join(d, group_by, "full_outer")
    new_cols = []
    for name in agg_names:
        new_cols.append(
            (
                F.coalesce(F.col(name), F.lit(0))
                + F.coalesce(F.col(f"_d_{name}"), F.lit(0))
            ).alias(name)
        )
    new_rows = (
        F.coalesce(F.col(ROWCOUNT_COL), F.lit(0))
        + F.coalesce(F.col(f"_d_{ROWCOUNT_COL}"), F.lit(0))
    ).alias(ROWCOUNT_COL)
    merged = merged.select(*group_by, *new_cols, new_rows)

    alive = merged.filter(F.col(ROWCOUNT_COL) > 0)
    dead = merged.filter(F.col(ROWCOUNT_COL) <= 0).select(*group_by)
    store.upsert(view, alive, primary_keys=group_by)
    if not dead.isEmpty():
        store.delete_where_in(view, group_by, dead)
    delta.unpersist()
    return touched


def _refresh_recompute(
    store: GraphStore,
    view: str,
    source: str,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    feed: DataFrame,
) -> int:
    """Affected-group recompute: min/max/avg are not invertible under
    deletes, so the touched groups are re-aggregated from the source
    via a semi-join (partition-pruned when the group keys are the
    source's bucket keys) — never the whole table."""
    affected = feed.select(*group_by).distinct().cache()
    touched = affected.count()
    if touched == 0:
        affected.unpersist()
        return 0
    src = store.read(source)
    recomputed = (
        src.join(affected, group_by, "left_semi")
        .groupBy(*group_by)
        .agg(*_agg_exprs(aggs), F.count(F.lit(1)).alias(ROWCOUNT_COL))
    )
    store.upsert(view, recomputed, primary_keys=group_by)
    vanished = affected.join(recomputed.select(*group_by), group_by, "left_anti")
    if not vanished.isEmpty():
        store.delete_where_in(view, group_by, vanished)
    affected.unpersist()
    return touched
