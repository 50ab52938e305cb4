"""Property-based gates for the round-5 iterative operators: random
inputs vs independent reference implementations (textbook BPE; plain
label propagation for star components)."""

from __future__ import annotations

import collections
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["low", "lower", "newest", "widest", "aaaa", "banana", "ab", "ba"]


def _textbook_bpe(words: dict[str, int], n: int):
    vocab = collections.Counter()
    for w, f in words.items():
        vocab[" ".join(list(w)) + " </w>"] += f
    merges = []
    for _ in range(n):
        pairs = collections.Counter()
        for seq, f in vocab.items():
            syms = seq.split()
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        mx = max(pairs.values())
        a, b = sorted(p for p, c in pairs.items() if c == mx)[0]
        merges.append((a, b, mx))
        pat = re.compile(r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        new = collections.Counter()
        for seq, f in vocab.items():
            new[pat.sub(a + b, seq)] += f
        vocab = new
    return merges


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=1, max_value=5),
)
def test_bpe_matches_textbook_on_random_corpora(spark, docs, n_merges):
    from robosystems_spark.operators.bpe import bpe_train

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(df, n_merges=n_merges).orderBy("merge_rank").collect()
    ]
    words = collections.Counter()
    for _, t in rows:
        for w in t.split():
            words[w] += 1
    assert got == _textbook_bpe(dict(words), n_merges)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_star_components_match_reference_union_find(spark, edges):
    from robosystems_spark.operators.graph import connected_components_star

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df, max_iters=10).collect()
    }
    # Reference union-find with min-id roots.
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    ref = {}
    for n in {x for e in edges for x in e}:
        r = find(n)
        ref[n] = r
    # normalize both to min-of-component labeling
    comp_min: dict[int, int] = {}
    for n, r in ref.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    ref = {n: comp_min[r] for n, r in ref.items()}
    assert got == ref


def test_touch_attribution_golden_small_case(spark):
    """Hand-checked attribution semantics: strictly-preceding frame
    (a purchase at the same user's first row attributes to 'none'),
    first vs last divergence, and per-model conversion conservation."""
    from robosystems_spark.operators.timeseries import touch_attribution

    rows = [
        # user 1: view, click, purchase(10), purchase(5)
        (1, 1, 100, "view", 0.0),
        (2, 1, 200, "click", 0.0),
        (3, 1, 300, "purchase", 10.0),
        (4, 1, 400, "purchase", 5.0),
        # user 2: purchase with no prior touch, then view, purchase
        (5, 2, 100, "purchase", 7.0),
        (6, 2, 200, "view", 0.0),
        (7, 2, 300, "purchase", 3.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double"
    )
    out = {
        (r["model"], r["touch_type"]): (r["conversions"], r["attributed_value"])
        for r in touch_attribution(ev).collect()
    }
    # user 1 first touch = view for both purchases; last touch = click
    assert out[("first_touch", "view")] == (3, 18.0)  # u1 x2 + u2 second
    assert out[("first_touch", "none")] == (1, 7.0)
    assert out[("last_touch", "click")] == (2, 15.0)
    assert out[("last_touch", "view")] == (1, 3.0)
    assert out[("last_touch", "none")] == (1, 7.0)
    for model in ("first_touch", "last_touch"):
        assert sum(v[0] for k, v in out.items() if k[0] == model) == 4


def test_dq_rule_audit_detects_injected_violations(spark):
    """The audit must count violations, not just report clean tables:
    inject an FK orphan, a date-order violation, and a domain breach
    and check the exact per-rule counts (plus explicit zeros)."""
    import datetime as dt

    from robosystems_spark.operators.profile import dq_rule_audit, tpch_dq_rules

    orders = spark.createDataFrame(
        [(1, 10, 100.0, dt.date(2024, 1, 10)), (2, 999, 50.0, dt.date(2024, 1, 5))],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 5.0, 0.05, dt.date(2024, 1, 12)),   # clean
            (3, 5.0, 0.05, dt.date(2024, 1, 12)),   # orphan orderkey
            (1, 5.0, 0.9, dt.date(2024, 1, 2)),     # bad discount AND ships before order
        ],
        "l_orderkey long, l_quantity double, l_discount double, l_shipdate date",
    )
    customer = spark.createDataFrame(
        [(10, 1)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame([(1,)], "n_nationkey long")
    out = {
        r["rule"]: r["n_violations"]
        for r in dq_rule_audit(
            tpch_dq_rules(
                {
                    "lineitem": lineitem,
                    "orders": orders,
                    "customer": customer,
                    "nation": nation,
                }
            )
        ).collect()
    }
    assert out["lineitem.l_orderkey -> orders"] == 1
    assert out["orders.o_custkey -> customer"] == 1      # custkey 999
    assert out["customer.c_nationkey -> nation"] == 0    # explicit green
    assert out["l_shipdate >= o_orderdate"] == 1
    assert out["l_discount in [0, 0.5]"] == 1
    assert out["o_totalprice > 0"] == 0
    assert out["l_quantity in (0, 60]"] == 0
