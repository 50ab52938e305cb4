#!/usr/bin/env python3
"""Deterministic scale-up of the driver's synthetic tables for scale
spot-runs (SCALE.md): clone /root/testdata/sf0.1 K times with
key-shifted ids, preserving every parquet schema bit-for-bit.

Why clones are the right scale model here: TPC-H itself scales by
growing the key domains linearly while nation/region stay fixed, so K
key-disjoint clones sharing nation/region reproduce the real scaling
shape — per-key fan-outs, join selectivities, and group cardinalities
all match the driver's generator at K*sf.  The two content tables get
clone-specific perturbation so content-similarity operators scale
honestly instead of drowning in artificial cross-clone duplicates:

- documents: a clone marker token is interleaved every 7 words, which
  destroys enough shingles that cross-clone pairs fall far below any
  near-dup threshold (within-clone structure is untouched);
- embeddings: deterministic per-clone jitter (~1e-3) breaks exact
  vector duplication without moving the distribution.

Usage: python scripts/make_scale_data.py [K] [SRC_DIR] [OUT_DIR]
Defaults: K=10, SRC=/root/testdata/sf0.1, OUT=/tmp/scale_sf1.
Output is NOT test data for correctness oracles — scaling runs only.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# key column -> table that owns the domain (shift = i * (max+1))
KEY_SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DOMAIN_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _perturb_text(texts: list[str | None], clone: int) -> list[str | None]:
    out = []
    marker = f"zz{clone}q"
    for j, t in enumerate(texts):
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        res = []
        for k, w in enumerate(words):
            res.append(w)
            if k % 7 == 6:
                res.append(f"{marker}{(j + k) % 97}")
        out.append(" ".join(res))
    return out


def _perturb_embeddings(tab: pa.Table, clone: int) -> pa.Table:
    col = tab.column("embedding").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    values = col.values.to_numpy(zero_copy_only=False).copy()
    rng = np.random.RandomState(1000 + clone)
    values += rng.uniform(-1e-3, 1e-3, size=values.shape).astype(np.float32)
    new = pa.ListArray.from_arrays(col.offsets, pa.array(values, pa.float32()))
    idx = tab.schema.get_field_index("embedding")
    return tab.set_column(idx, tab.schema.field(idx), new)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_sf1"
    os.makedirs(out, exist_ok=True)

    base: dict[str, pa.Table] = {
        t: pq.read_table(f"{src}/{t}.parquet") for t in TABLES
    }
    domain_size: dict[str, int] = {}
    for col, (tab, own_col) in DOMAIN_OWNER.items():
        mx = pc.max(base[tab].column(own_col)).as_py()
        domain_size[col] = int(mx) + 1

    for t in TABLES:
        src_tab = base[t]
        if t in ("region", "nation"):
            pq.write_table(src_tab, f"{out}/{t}.parquet")
            print(t, src_tab.num_rows, "(fixed)")
            continue
        clones = []
        for i in range(k):
            tab = src_tab
            for col in KEY_SHIFTS.get(t, []):
                shift = i * domain_size[col]
                idx = tab.schema.get_field_index(col)
                shifted = pc.add(tab.column(col), pa.scalar(
                    shift, tab.schema.field(idx).type))
                tab = tab.set_column(idx, tab.schema.field(idx), shifted)
            if t == "documents" and i > 0:
                texts = tab.column("text").to_pylist()
                new_texts = _perturb_text(texts, i)
                ti = tab.schema.get_field_index("text")
                tab = tab.set_column(
                    ti, tab.schema.field(ti), pa.array(new_texts, pa.string())
                )
                ni = tab.schema.get_field_index("n_chars")
                tab = tab.set_column(
                    ni, tab.schema.field(ni),
                    pa.array([len(x) if x is not None else None
                              for x in new_texts], pa.int64()),
                )
            if t == "embeddings" and i > 0:
                tab = _perturb_embeddings(tab, i)
            clones.append(tab)
        big = pa.concat_tables(clones)
        pq.write_table(big, f"{out}/{t}.parquet")
        print(t, big.num_rows)


if __name__ == "__main__":
    main()
