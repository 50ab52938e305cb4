"""Driver-resident twins for the token/shingle set-similarity
operators (r13), following the measured-gate resident-tier discipline
of ``operators/graph.py`` (pagerank/kcore/LPA) and the r13 fused
co-purchase construction: under measured input bounds the whole
pipeline — tokenize → md5 shingle hash → signatures/blocks →
candidate pairs → exact verify — runs as one bounded Arrow collect
plus vectorized numpy, returning results identical to the distributed
plan bit-for-bit; above any gate the caller falls back to the
UNCHANGED distributed plan (the one that survives 100 TB).

Why this is a faithful twin and not an approximation:

- Every hash is integer arithmetic the distributed plan also does
  (md5-15-hex mod P, Carter-Wegman perms, Horner shingles) — exact in
  any engine.
- Tokenization parity is *gated*, not assumed: Spark's
  ``split(lower(trim(text)), '\\s+')`` matches Python's
  ``re.split(r'\\s+', s.strip(' ').lower())`` exactly when the text is
  pure ASCII (Java regex ``\\s`` = ``[ \\t\\n\\x0B\\f\\r]`` which is the
  ASCII subset of Python's ``\\s``; ``lower``/``substring`` agree
  trivially on ASCII).  The collect gate therefore *measures*
  ``max(octet_length - char_length) == 0`` and bails to the
  distributed plan on any non-ASCII corpus.
- The only floats are the display-rounded ratios; rounding goes
  through the proven Catalyst HALF_UP twin
  (:func:`robosystems_spark.operators.graph._round_half_up_np`), and
  jaccard division is the same IEEE double op both sides.

Gate budgets (the broadcast-memory class, same reasoning as
``RESIDENT_EDGES_MAX``): ``RESIDENT_DOCS_MAX`` rows and
``RESIDENT_TEXT_BYTES_MAX`` total text bytes bound the one Arrow
collect; both are measured with one aggregate job before anything is
collected.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESIDENT_DOCS_MAX = 200_000
RESIDENT_TEXT_BYTES_MAX = 64 * 1024 * 1024

_WS = re.compile(r"\s+")

_INTEGRAL = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)


def collect_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    max_docs: int | None = None,
    extra_cols: tuple[str, ...] = (),
):
    """One measured-gate Arrow collect of ``(id, text, *extras)``.

    Returns ``(ids, texts, n_rows, extras)`` — ids as int64 numpy
    (None when ``id_col`` is None — operators like PPMI consume texts
    only), texts as a Python list (None entries preserved), n_rows
    the total row count (the gate aggregate's count, which callers
    like ``weighted_jaccard_pairs`` need anyway), extras a dict of
    ``extra_cols`` name -> Python list — or ``None`` when any gate
    fails:

    - id column not integral / text column not string (schema gate);
    - row count above ``max_docs`` (default ``RESIDENT_DOCS_MAX``);
    - total text bytes above ``RESIDENT_TEXT_BYTES_MAX``;
    - any non-ASCII character (tokenization-parity gate, see module
      docstring);
    - any NULL or duplicate id (never joins/groups the way a twin
      would model — bail rather than re-model).
    """
    if max_docs is None:
        max_docs = RESIDENT_DOCS_MAX
    if max_docs <= 0:
        return None
    schema = {f.name: f.dataType for f in df.schema.fields}
    if id_col is not None and not isinstance(schema.get(id_col), _INTEGRAL):
        return None
    if not isinstance(schema.get(text_col), T.StringType):
        return None
    t = F.col(text_col)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length(t)).alias("b"),
        F.max(F.octet_length(t) - F.length(t)).alias("w"),
    ]
    if id_col is not None:
        aggs += [
            F.sum(F.col(id_col).isNull().cast("int")).alias("ni"),
            F.count_distinct(F.col(id_col)).alias("nd"),
        ]
    gate = df.agg(*aggs).collect()[0]
    if gate["n"] > max_docs:
        return None
    if (gate["b"] or 0) > RESIDENT_TEXT_BYTES_MAX:
        return None
    if (gate["w"] or 0) != 0:
        return None
    if id_col is not None:
        if (gate["ni"] or 0) != 0:
            return None
        if gate["nd"] != gate["n"]:
            # duplicate ids: collect_set-based bucket semantics and
            # the verify joins interact with dup rows in ways a twin
            # should not re-model — run the distributed plan
            return None
    import numpy as np

    cols = ([id_col] if id_col is not None else []) + [text_col] + list(
        extra_cols
    )
    tbl = df.select(*cols).toArrow().combine_chunks()
    pos = 0
    ids = None
    if id_col is not None:
        ids = tbl.column(0).to_numpy().astype(np.int64, copy=False)
        pos = 1
    texts = tbl.column(pos).to_pylist()
    extras = {
        name: tbl.column(pos + 1 + i).to_pylist()
        for i, name in enumerate(extra_cols)
    }
    return ids, texts, int(gate["n"]), extras


def pairs_schema(
    df: DataFrame,
    id_col: str,
    weighted: bool = False,
    ids_nullable: bool = False,
) -> T.StructType:
    """Output schema of the pair operators, constructed rather than
    derived from the lazy distributed plan — analyzing the real
    minhash plan costs ~1.4 s of driver time per call (the r12 BPE
    plan-analysis lesson), two orders more than the resident kernel
    itself.  Nullability facts (pinned by schema-equality asserts in
    tests/test_resident_tiers.py against the actual distributed
    plans): pair ids inherit the id column's TYPE; explode-of-
    collect_set pair generation strips nullability (minhash / prefix /
    weighted), while the blocked self-join preserves the input id
    nullability (``ids_nullable``); every derived measure column is
    nullable."""
    idt = df.schema[id_col].dataType
    idn = df.schema[id_col].nullable if ids_nullable else False
    fields = [
        T.StructField("doc_a", idt, idn),
        T.StructField("doc_b", idt, idn),
    ]
    if weighted:
        fields += [
            T.StructField("w_shared", T.LongType(), True),
            T.StructField("w_union", T.LongType(), True),
            T.StructField("weighted_jaccard", T.DoubleType(), True),
        ]
    else:
        fields.append(T.StructField("jaccard", T.DoubleType(), True))
    return T.StructType(fields)


def _tokens(s: str) -> list[str]:
    """Exact twin of ``operators.text.tokens`` on ASCII input:
    ``split(lower(trim(text)), '\\s+')`` — Spark ``trim`` strips the
    space character only."""
    return _WS.split(s.strip(" ").lower())


# md5/Horner constants — MUST mirror operators.dedup (the oracle
# contract); imported there, re-exported here for the kernels.
from robosystems_spark.operators.dedup import (  # noqa: E402
    MINHASH_P as _P,
    SHINGLE_B as _B,
    minhash_perm_consts,
)


def _hash_token(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % _P


def _tokenize_corpus(texts):
    """Shared tokenize pass: returns ``(vocab_list, doc_codes)`` where
    ``doc_codes[i]`` is an int64 numpy array of per-position vocab
    codes (None for NULL text).  The vocabulary dict makes the md5
    pass O(distinct tokens), not O(token occurrences) — values are
    identical (md5 is a pure function of the token)."""
    import numpy as np

    vocab: dict[str, int] = {}
    doc_codes = []
    get = vocab.get
    for s in texts:
        if s is None:
            doc_codes.append(None)
            continue
        toks = _tokens(s)
        codes = np.empty(len(toks), dtype=np.int64)
        for i, tok in enumerate(toks):
            c = get(tok)
            if c is None:
                c = len(vocab)
                vocab[tok] = c
            codes[i] = c
        doc_codes.append(codes)
    return list(vocab), doc_codes


def _vocab_hashes(vocab):
    import numpy as np

    return np.array([_hash_token(tok) for tok in vocab], dtype=np.int64)


def _shingle_sets(doc_codes, vh, k: int):
    """Distinct hashed k-shingle array per doc — the
    ``distinct_shingles`` twin: position i's Horner fold over token
    hashes i..i+k-1 with COALESCE(0) past the end, positions
    0..max(n-k, 0), then distinct.  Returns a list of sorted int64
    arrays (None for NULL text)."""
    import numpy as np

    zeros = np.zeros(k, dtype=np.int64)
    out = []
    for codes in doc_codes:
        if codes is None:
            out.append(None)
            continue
        th = vh[codes]
        n = len(th)
        npos = max(n - k, 0) + 1
        pad = np.concatenate([th, zeros])
        h = pad[0:npos].copy()
        for j in range(1, k):
            h = (h * _B + pad[j : npos + j]) % _P
        out.append(np.unique(h))
    return out


def _token_sets(doc_codes, vh):
    """Distinct hashed... no — distinct TOKEN-CODE set per doc (the
    unigram ``array_distinct(tokens(text))`` element space).  Keeps
    vocab codes (not hashes): unigram paths compare/join on the token
    STRING, and codes are a bijection of the strings within one
    corpus."""
    import numpy as np

    del vh
    return [
        None if c is None else np.unique(c) for c in doc_codes
    ]


def _round6(vals):
    from robosystems_spark.operators.graph import _round_half_up_np

    return _round_half_up_np(vals, 6)


def _pairs_from_groups(group_ids, members):
    """All (a, b) with a < b inside each group, as two int64 arrays.
    ``group_ids``: sorted int64 codes (one per member row) —
    members of one group are contiguous; ``members``: the member
    values (doc ids).  Mirrors the bucket-grouped
    posexplode+slice expansion (pairs within a bucket, a < b after
    sort)."""
    import numpy as np

    if len(group_ids) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    order = np.lexsort((members, group_ids))
    g = group_ids[order]
    m = members[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    lens = np.diff(np.r_[starts, len(g)])
    grp = np.cumsum(np.r_[False, g[1:] != g[:-1]])
    rem = starts[grp] + lens[grp] - np.arange(len(g)) - 1
    pa, pb = [], []
    valid = np.arange(len(g))
    d = 1
    while True:
        valid = valid[rem[valid] >= d]
        if len(valid) == 0:
            break
        pa.append(m[valid])
        pb.append(m[valid + d])
        d += 1
    if not pa:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(pa), np.concatenate(pb)


def _dedup_pairs(a, b):
    """DISTINCT (a, b) pairs (inputs already a < b)."""
    import numpy as np

    if len(a) == 0:
        return a, b
    codes = np.unique(a * (1 << 32) + b)
    return (codes >> 32).astype(np.int64), (codes & 0xFFFFFFFF).astype(
        np.int64
    )


def _pack_ok(ids) -> bool:
    """Pair codes pack as a*2^32+b only for ids in [0, 2^31)."""
    return len(ids) == 0 or (int(ids.min()) >= 0 and int(ids.max()) < (1 << 31))


def _set_jaccard(sets, idx_of, pa, pb):
    """Exact |∩|/|∪| per pair over per-doc sorted distinct arrays."""
    import numpy as np

    jac = np.empty(len(pa), dtype=np.float64)
    for i in range(len(pa)):
        sa = sets[idx_of[pa[i]]]
        sb = sets[idx_of[pb[i]]]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        jac[i] = inter / (len(sa) + len(sb) - inter)
    return jac


def minhash_pairs_resident(
    ids,
    texts,
    threshold: float,
    num_hashes: int,
    bands: int,
    shingle_k: int,
):
    """Resident twin of ``minhash_near_duplicates``: returns a pandas
    DataFrame (doc_a, doc_b, jaccard) or None if ids don't pack.

    Parity notes: the banded grouping uses the sig-slice TUPLE where
    the distributed plan joins on the comma-joined STRING — a
    bijection (the string is just the joined ints), so buckets are
    identical.  Verify is the same exact shingle-set jaccard, rounded
    HALF_UP 6 then filtered ``>= threshold``, as ``jaccard_verify``.
    """
    import numpy as np
    import pandas as pd

    if not _pack_ok(ids):
        return None
    vocab, doc_codes = _tokenize_corpus(texts)
    vh = _vocab_hashes(vocab)
    sh = _shingle_sets(doc_codes, vh, shingle_k)
    live = [i for i, s in enumerate(sh) if s is not None]
    if not live:
        return pd.DataFrame(
            {"doc_a": [], "doc_b": [], "jaccard": []}
        ).astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
    live_sets = [sh[i] for i in live]
    live_ids = ids[live]
    lens = np.array([len(s) for s in live_sets], dtype=np.int64)
    allsh = np.concatenate(live_sets)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    rows = num_hashes // bands
    sigs = np.empty((len(live_sets), num_hashes), dtype=np.int64)
    for i in range(num_hashes):
        a, b = minhash_perm_consts(i)
        hv = (a * allsh + b) % _P
        sigs[:, i] = np.minimum.reduceat(hv, starts)
    pa_all, pb_all = [], []
    for band in range(bands):
        sl = sigs[:, band * rows : (band + 1) * rows]
        _, inv = np.unique(sl, axis=0, return_inverse=True)
        pa, pb = _pairs_from_groups(inv.astype(np.int64), live_ids)
        pa_all.append(pa)
        pb_all.append(pb)
    pa = np.concatenate(pa_all)
    pb = np.concatenate(pb_all)
    pa, pb = _dedup_pairs(pa, pb)
    idx_of = {int(d): i for i, d in enumerate(live_ids)}
    jac = _round6(_set_jaccard(live_sets, idx_of, pa, pb))
    keep = jac >= threshold
    return pd.DataFrame(
        {"doc_a": pa[keep], "doc_b": pb[keep], "jaccard": jac[keep]}
    )


def jaccard_prefix_resident(
    ids, texts, threshold: float, shingle_k: int | None, ndigits: int = 6
):
    """Resident twin of ``jaccard_prefix_join``: PPJoin prefix
    filtering over the shingle (or unigram-token) element space.

    Element-space parity: with ``shingle_k`` the elements are the
    Horner shingle hashes (identical ints both sides); without, the
    elements are token STRINGS — the prefix ranking orders by
    (frequency asc, token asc), so the unigram path sorts by the
    actual string (ASCII bytewise == Java string compare)."""
    import numpy as np
    import pandas as pd

    if not _pack_ok(ids):
        return None
    vocab, doc_codes = _tokenize_corpus(texts)
    if shingle_k:
        vh = _vocab_hashes(vocab)
        sets = _shingle_sets(doc_codes, vh, shingle_k)
        # element order for the rank tie-break: numeric hash value —
        # the distributed plan orders by the hash column itself
        elem_order = None
    else:
        sets = _token_sets(doc_codes, None)
        # tie-break orders by token STRING; map codes -> rank of the
        # string so np comparisons reproduce the string order
        str_rank = np.empty(len(vocab), dtype=np.int64)
        str_rank[np.argsort(np.array(vocab, dtype=object))] = np.arange(
            len(vocab)
        )
        elem_order = str_rank
    live = [i for i, s in enumerate(sets) if s is not None and len(s) >= 1]
    empty = pd.DataFrame(
        {"doc_a": [], "doc_b": [], "jaccard": []}
    ).astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
    if not live:
        return empty
    live_sets = [sets[i] for i in live]
    live_ids = ids[live]
    lens = np.array([len(s) for s in live_sets], dtype=np.int64)
    alltok = np.concatenate(live_sets)
    doc_rep = np.repeat(live_ids, lens)
    # global element frequency (per-doc sets are distinct already)
    uniq, inv, cnt = np.unique(alltok, return_inverse=True, return_counts=True)
    freq = cnt[inv]
    # per-doc rank by (freq asc, element asc) — element order is the
    # hash value (shingles) or the string rank (unigrams)
    if elem_order is None:
        elem_key = alltok
    else:
        elem_key = elem_order[alltok]
    doc_idx = np.repeat(np.arange(len(live_sets)), lens)
    order = np.lexsort((elem_key, freq, doc_idx))
    # row_number within doc over the (freq asc, element asc) order
    rn = np.empty(len(alltok), dtype=np.int64)
    sorted_doc = doc_idx[order]
    grp_start = np.flatnonzero(np.r_[True, sorted_doc[1:] != sorted_doc[:-1]])
    grp_len = np.diff(np.r_[grp_start, len(sorted_doc)])
    rn[order] = np.arange(len(alltok)) - np.repeat(grp_start, grp_len) + 1
    n_per = lens[doc_idx]
    prefix_len = n_per - np.ceil(threshold * n_per).astype(np.int64) + 1
    pre = rn <= prefix_len
    pa, pb = _pairs_from_groups(alltok[pre], doc_rep[pre])
    pa, pb = _dedup_pairs(pa, pb)
    idx_of = {int(d): i for i, d in enumerate(live_ids)}
    jac = _round6(_set_jaccard(live_sets, idx_of, pa, pb))
    keep = jac >= threshold
    return pd.DataFrame(
        {"doc_a": pa[keep], "doc_b": pb[keep], "jaccard": jac[keep]}
    )


def blocked_pairs_resident(
    ids, texts, threshold: float, cap: int, ndigits: int = 6
):
    """Resident twin of ``inventory.llm.jaccard_blocked_pairs``:
    32-char-prefix blocks, ceil(size/cap) modulo sub-split, ALL pairs
    within a (blk, sub) group verified by exact unigram-token-set
    jaccard (round 6, >= threshold)."""
    import numpy as np
    import pandas as pd

    if not _pack_ok(ids):
        return None
    vocab, doc_codes = _tokenize_corpus(texts)
    sets = _token_sets(doc_codes, None)
    live = [i for i, t in enumerate(texts) if t is not None]
    empty = pd.DataFrame(
        {"doc_a": [], "doc_b": [], "jaccard": []}
    ).astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
    if not live:
        return empty
    live_ids = ids[live]
    live_sets = [sets[i] for i in live]
    blks = [texts[i][:32] for i in live]
    buniq, binv = np.unique(np.array(blks, dtype=object), return_inverse=True)
    bcnt = np.bincount(binv)
    nsub = np.ceil(bcnt / float(cap)).astype(np.int64)
    sub = np.mod(np.mod(live_ids, nsub[binv]) + nsub[binv], nsub[binv])
    gcode = binv.astype(np.int64) * (1 << 32) + sub
    _, ginv = np.unique(gcode, return_inverse=True)
    pa, pb = _pairs_from_groups(ginv.astype(np.int64), live_ids)
    pa, pb = _dedup_pairs(pa, pb)  # groups are disjoint; sorts pairs
    idx_of = {int(d): i for i, d in enumerate(live_ids)}
    jac = _round6(_set_jaccard(live_sets, idx_of, pa, pb))
    keep = jac >= threshold
    return pd.DataFrame(
        {"doc_a": pa[keep], "doc_b": pb[keep], "jaccard": jac[keep]}
    )


def weighted_jaccard_resident(
    ids,
    texts,
    n_docs: int,
    threshold_num: int,
    threshold_den: int,
    block_cap: int,
    scale: int,
):
    """Resident twin of ``weighted_jaccard_pairs``.  Returns the
    pandas frame or None when the ln-lattice guard trips (a token
    weight within 1e-8 of a HALF_UP boundary after scaling — closer
    than any cross-library 1-ulp ln() divergence can move it, so
    outside the guard numpy's and Java's rounded weights provably
    agree; inside it we bail to the distributed plan rather than
    risk a boundary flip)."""
    import numpy as np
    import pandas as pd

    if not _pack_ok(ids):
        return None
    vocab, doc_codes = _tokenize_corpus(texts)
    sets = _token_sets(doc_codes, None)
    live = [i for i, t in enumerate(texts) if t is not None]
    empty = pd.DataFrame(
        {
            "doc_a": [],
            "doc_b": [],
            "w_shared": [],
            "w_union": [],
            "weighted_jaccard": [],
        }
    ).astype(
        {
            "doc_a": "int64",
            "doc_b": "int64",
            "w_shared": "int64",
            "w_union": "int64",
            "weighted_jaccard": "float64",
        }
    )
    if not live:
        return empty
    live_ids = ids[live]
    live_sets = [sets[i] for i in live]
    lens = np.array([len(s) for s in live_sets], dtype=np.int64)
    alltok = np.concatenate(live_sets) if len(live_sets) else np.empty(0, np.int64)
    # document frequency per token code (per-doc sets distinct)
    dfreq = np.bincount(alltok, minlength=len(vocab))
    used = np.flatnonzero(dfreq)
    raw = np.log(float(n_docs) / dfreq[used].astype(np.float64)) * scale
    frac = np.abs(raw - np.floor(raw) - 0.5)
    if len(raw) and float(frac.min()) < 1e-8:
        return None  # ln-lattice guard (see docstring)
    w = np.zeros(len(vocab), dtype=np.int64)
    from robosystems_spark.operators.graph import _round_half_up_np

    w[used] = _round_half_up_np(raw, 0).astype(np.int64)
    totals = np.array([int(w[s].sum()) for s in live_sets], dtype=np.int64)
    # blocks over docs with non-null text (the explode drops null toks)
    blks = [texts[i][:32] for i in live]
    buniq, binv = np.unique(np.array(blks, dtype=object), return_inverse=True)
    bcnt = np.bincount(binv)
    nsub = np.ceil(bcnt / float(block_cap)).astype(np.int64)
    sub = np.mod(np.mod(live_ids, nsub[binv]) + nsub[binv], nsub[binv])
    # (blk, sub, token) buckets: shared-weight sums per candidate pair.
    # Pack (blk, sub, token) into one int64 group code — guard the
    # packing arithmetic against silent int64 wrap on huge vocabularies
    # (numpy would not raise).
    if (int(binv.max()) * (1 << 20) + int(nsub.max())) * (
        len(vocab) + 1
    ) + len(vocab) >= (1 << 62):
        return None
    doc_rep = np.repeat(np.arange(len(live_ids)), lens)
    gcode = (binv.astype(np.int64)[doc_rep] * (1 << 20) + sub[doc_rep]) * np.int64(
        len(vocab) + 1
    ) + alltok
    wtok = w[alltok]
    # pairs within a (blk,sub,tok) bucket all share that bucket's
    # token weight: expand with the member-index trick, carrying mw
    order = np.lexsort((doc_rep, gcode))
    g = gcode[order]
    m = doc_rep[order]
    mw = wtok[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    glens = np.diff(np.r_[starts, len(g)])
    grp = np.cumsum(np.r_[False, g[1:] != g[:-1]])
    rem = starts[grp] + glens[grp] - np.arange(len(g)) - 1
    pa_l, pb_l, pw_l = [], [], []
    valid = np.arange(len(g))
    d = 1
    while True:
        valid = valid[rem[valid] >= d]
        if len(valid) == 0:
            break
        pa_l.append(m[valid])
        pb_l.append(m[valid + d])
        pw_l.append(mw[valid])
        d += 1
    if not pa_l:
        return empty  # no bucket holds two docs -> no candidate pairs
    pa_i = np.concatenate(pa_l)
    pb_i = np.concatenate(pb_l)
    pw = np.concatenate(pw_l)
    a_ids = live_ids[pa_i]
    b_ids = live_ids[pb_i]
    lo = np.minimum(a_ids, b_ids)
    hi = np.maximum(a_ids, b_ids)
    codes = lo * (1 << 32) + hi
    ucodes, cinv = np.unique(codes, return_inverse=True)
    shared = np.zeros(len(ucodes), dtype=np.int64)
    np.add.at(shared, cinv, pw)
    doc_a = (ucodes >> 32).astype(np.int64)
    doc_b = (ucodes & 0xFFFFFFFF).astype(np.int64)
    idx_of = {int(dv): i for i, dv in enumerate(live_ids)}
    ta = np.array([totals[idx_of[int(x)]] for x in doc_a], dtype=np.int64)
    tb = np.array([totals[idx_of[int(x)]] for x in doc_b], dtype=np.int64)
    union = ta + tb - shared
    keep = shared * threshold_den >= union * threshold_num
    ratio = _round6(
        shared[keep].astype(np.float64) / union[keep].astype(np.float64)
    )
    return pd.DataFrame(
        {
            "doc_a": doc_a[keep],
            "doc_b": doc_b[keep],
            "w_shared": shared[keep],
            "w_union": union[keep],
            "weighted_jaccard": ratio,
        }
    )


_LN_GUARD = 1e-5


def _ln_lattice(vals, scale: float, digits: int = 0):
    """``round_half_up(ln-derived * scale)`` with the cross-library
    guard: returns None when any element lands within ``_LN_GUARD``
    of a HALF_UP boundary after scaling — far wider than any 1-ulp
    ln() divergence between numpy's libm and java.lang.Math can move
    a value, so outside the guard both libraries provably round to
    the same integer; inside it callers bail to the distributed
    plan."""
    import numpy as np

    from robosystems_spark.operators.graph import _round_half_up_np

    v = vals * scale
    if len(v):
        frac = np.abs(v - np.floor(v) - 0.5)
        if float(frac.min()) < _LN_GUARD:
            return None
    return _round_half_up_np(v, digits)


def ppmi_resident(
    texts,
    k: int,
    min_count: int,
    scale: int,
    decimals: int,
    max_context_degree: int,
    max_vocab: int | None,
):
    """Resident twin of ``corpus.ppmi_word_similarity``: identical
    skip-gram pair multiset (offsets 1 and 2, symmetrized), joint
    counts, vocab cap (count desc, word asc), integer-scaled PPMI
    lattice with the ln guard, hot-context truncation, exact integer
    dots/norms, IEEE cosine + HALF_UP round, (cosine desc, w1, w2)
    top-k.  Returns a pandas frame or None (ln guard)."""
    import numpy as np
    import pandas as pd

    vocab, doc_codes = _tokenize_corpus(texts)
    V = len(vocab)
    pa, pb = [], []
    for codes in doc_codes:
        if codes is None:
            continue
        for o in (1, 2):
            if len(codes) > o:
                a = codes[:-o]
                b = codes[o:]
                pa.append(a)
                pb.append(b)
                pa.append(b)
                pb.append(a)
    empty = pd.DataFrame({"w1": [], "w2": [], "cosine": []}).astype(
        {"w1": "object", "w2": "object", "cosine": "float64"}
    )
    if not pa:
        return empty
    a = np.concatenate(pa)
    b = np.concatenate(pb)
    codes, cwc = np.unique(a * np.int64(V) + b, return_counts=True)
    jw = (codes // V).astype(np.int64)
    jc = (codes % V).astype(np.int64)
    cwc = cwc.astype(np.int64)
    # word marginals (sum of joint counts per word)
    cw = np.zeros(V, dtype=np.int64)
    np.add.at(cw, jw, cwc)
    n_total = float(int(cwc.sum()))  # .cast("double") of the long sum
    # vocab cap: rank by (count desc, word-string asc)
    in_vocab = np.ones(V, dtype=bool)
    if max_vocab is not None and V > max_vocab:
        str_rank = np.empty(V, dtype=np.int64)
        str_rank[np.argsort(np.array(vocab, dtype=object))] = np.arange(V)
        order = np.lexsort((str_rank, -cw))
        in_vocab[:] = False
        in_vocab[order[:max_vocab]] = True
    keep = (
        in_vocab[jw]
        & in_vocab[jc]
        & (cw[jw] >= min_count)
        & (cw[jc] >= min_count)
    )
    jw, jc, cwc = jw[keep], jc[keep], cwc[keep]
    if len(jw) == 0:
        return empty
    # PPMI lattice: round(max(0, ln(cwc*N/(cw1*cw2))) * scale)
    lnv = np.log(
        (cwc.astype(np.float64) * n_total)
        / (cw[jw] * cw[jc]).astype(np.float64)
    )
    p = _ln_lattice(np.maximum(lnv, 0.0), float(scale))
    if p is None:
        return None
    p = p.astype(np.int64)
    pos = p > 0
    jw, jc, p = jw[pos], jc[pos], p[pos]
    # hot-context truncation: per-context row count over the
    # positive-PPMI matrix
    deg = np.zeros(V, dtype=np.int64)
    np.add.at(deg, jc, 1)
    cold = deg[jc] <= max_context_degree
    jw, jc, p = jw[cold], jc[cold], p[cold]
    if len(jw) == 0:
        return empty
    # norms per word (exact integer)
    n2 = np.zeros(V, dtype=np.int64)
    np.add.at(n2, jw, p * p)
    # dots: pairs of words sharing a context — group rows by context,
    # expand in-bucket pairs carrying pa*pb (the weighted-jaccard
    # expansion), restrict to w1 < w2 in STRING order
    str_rank = np.empty(V, dtype=np.int64)
    str_rank[np.argsort(np.array(vocab, dtype=object))] = np.arange(V)
    order = np.lexsort((str_rank[jw], jc))
    g = jc[order]
    m = jw[order]
    mp = p[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    glens = np.diff(np.r_[starts, len(g)])
    grp = np.cumsum(np.r_[False, g[1:] != g[:-1]])
    rem = starts[grp] + glens[grp] - np.arange(len(g)) - 1
    w1_l, w2_l, dd_l = [], [], []
    valid = np.arange(len(g))
    d = 1
    while True:
        valid = valid[rem[valid] >= d]
        if len(valid) == 0:
            break
        w1_l.append(m[valid])
        w2_l.append(m[valid + d])
        dd_l.append(mp[valid] * mp[valid + d])
        d += 1
    if not w1_l:
        return empty
    w1 = np.concatenate(w1_l)
    w2 = np.concatenate(w2_l)
    dd = np.concatenate(dd_l)
    # members were sorted by string rank within a context group, so
    # w1 < w2 in string order EXCEPT equal words (w1 == w2) — the
    # distributed filter is strict <
    ne = w1 != w2
    w1, w2, dd = w1[ne], w2[ne], dd[ne]
    pcodes, pinv = np.unique(w1 * np.int64(V) + w2, return_inverse=True)
    dots = np.zeros(len(pcodes), dtype=np.int64)
    np.add.at(dots, pinv, dd)
    u1 = (pcodes // V).astype(np.int64)
    u2 = (pcodes % V).astype(np.int64)
    cosine = dots.astype(np.float64) / (
        np.sqrt(n2[u1].astype(np.float64)) * np.sqrt(n2[u2].astype(np.float64))
    )
    from robosystems_spark.operators.graph import _round_half_up_np

    cosine = _round_half_up_np(cosine, decimals)
    words = np.array(vocab, dtype=object)
    rows = sorted(
        zip(words[u1], words[u2], cosine),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:k]
    return pd.DataFrame(
        {
            "w1": [r[0] for r in rows],
            "w2": [r[1] for r in rows],
            "cosine": [float(r[2]) for r in rows],
        }
    )


def dsir_resident(
    ids, texts, targets, buckets: int, decimals: int
):
    """Resident twin of ``corpus.dsir_importance``: hashed
    unigram+bigram bag features (md5-15-hex mod buckets over the
    DISTINCT gram vocabulary), Laplace-smoothed bucket statistics,
    per-document exact BIGINT lattice sums, one rounded float at the
    end.  Returns a pandas frame or None (ln guard)."""
    import numpy as np
    import pandas as pd

    vocab, doc_codes = _tokenize_corpus(texts)
    gram_vocab: dict[tuple, int] = {}
    rows_doc, rows_bucket = [], []
    doc_is_target = []
    live_ids = []
    # gram codes per doc: unigrams ++ bigrams (as code pairs)
    gv_get = gram_vocab.get
    for i, codes in enumerate(doc_codes):
        if codes is None:
            continue
        live_ids.append(ids[i])
        doc_is_target.append(targets[i])
        grams = [(int(c),) for c in codes]
        if len(codes) >= 2:
            grams += list(zip(codes[:-1].tolist(), codes[1:].tolist()))
        gcodes = np.empty(len(grams), dtype=np.int64)
        for j, gm in enumerate(grams):
            cc = gv_get(gm)
            if cc is None:
                cc = len(gram_vocab)
                gram_vocab[gm] = cc
            gcodes[j] = cc
        rows_doc.append(np.full(len(gcodes), len(live_ids) - 1, dtype=np.int64))
        rows_bucket.append(gcodes)
    out_cols = {"_id": [], "n_features": [], "log_importance": []}
    if not rows_doc:
        return pd.DataFrame(out_cols).astype(
            {"_id": "int64", "n_features": "int64", "log_importance": "float64"}
        )
    # hash the DISTINCT gram vocabulary once
    gram_hash = np.empty(len(gram_vocab), dtype=np.int64)
    for gm, cc in gram_vocab.items():
        text = vocab[gm[0]] if len(gm) == 1 else (
            vocab[gm[0]] + " " + vocab[gm[1]]
        )
        gram_hash[cc] = _hash_token_mod(text, buckets)
    doc = np.concatenate(rows_doc)
    bkt = gram_hash[np.concatenate(rows_bucket)]
    nd = len(live_ids)
    # (doc, bucket) counts
    codes, c = np.unique(doc * np.int64(buckets) + bkt, return_counts=True)
    cdoc = (codes // buckets).astype(np.int64)
    cbkt = (codes % buckets).astype(np.int64)
    c = c.astype(np.int64)
    is_t = np.array(
        [bool(t) if t is not None else False for t in doc_is_target]
    )
    ct = np.zeros(buckets, dtype=np.int64)
    cr = np.zeros(buckets, dtype=np.int64)
    np.add.at(ct, cbkt[is_t[cdoc]], c[is_t[cdoc]])
    np.add.at(cr, cbkt, c)
    nt, nr = int(ct.sum()), int(cr.sum())
    # sl(x) = round(1e9 * ln(x)) over the distinct integer arguments
    args = np.unique(
        np.concatenate(
            [
                ct[cbkt] + 1,
                cr[cbkt] + 1,
                np.array([nr + buckets, nt + buckets], dtype=np.int64),
            ]
        )
    )
    sl_vals = _ln_lattice(np.log(args.astype(np.float64)), 1e9)
    if sl_vals is None:
        return None
    sl_vals = sl_vals.astype(np.int64)
    sl = dict(zip(args.tolist(), sl_vals.tolist()))
    const = sl[nr + buckets] - sl[nt + buckets]
    term = np.array(
        [sl[x] for x in (ct[cbkt] + 1).tolist()], dtype=np.int64
    ) - np.array([sl[x] for x in (cr[cbkt] + 1).tolist()], dtype=np.int64)
    contrib = c * (term + const)
    nf = np.zeros(nd, dtype=np.int64)
    s = np.zeros(nd, dtype=np.int64)
    np.add.at(nf, cdoc, c)
    np.add.at(s, cdoc, contrib)
    from robosystems_spark.operators.graph import _round_half_up_np

    li = _round_half_up_np(s.astype(np.float64) / 1e9, decimals)
    return pd.DataFrame(
        {
            "_id": np.array(live_ids, dtype=np.int64),
            "n_features": nf,
            "log_importance": li,
        }
    )


def _hash_token_mod(tok: str, mod: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % mod


def decontaminate_resident(ids, texts, train_mask, ngram: int):
    """Resident twin of ``corpus.decontaminate`` for the same-table
    split case: per-doc DISTINCT ``ngram``-token shingle STRINGS
    (token-code tuples — a bijection of the joined strings, since
    tokens contain no whitespace), holdout set union, per-train-doc
    distinct shared count.  Pure integers/sets — exact.  Returns a
    pandas frame (doc_id, n_shared_ngrams) for docs with >= 1 share.
    """
    import numpy as np
    import pandas as pd

    _vocab, doc_codes = _tokenize_corpus(texts)

    def doc_shingles(codes):
        n = len(codes)
        tup = codes.tolist()
        return {
            tuple(tup[i : i + ngram])
            for i in range(max(n - ngram, 0) + 1)
        }

    holdout: set = set()
    for i in np.flatnonzero(~train_mask):
        if doc_codes[i] is not None:
            holdout |= doc_shingles(doc_codes[i])
    out_ids, out_counts = [], []
    for i in np.flatnonzero(train_mask):
        if doc_codes[i] is None:
            continue
        shared = len(doc_shingles(doc_codes[i]) & holdout)
        if shared:
            out_ids.append(int(ids[i]))
            out_counts.append(shared)
    return pd.DataFrame(
        {
            "doc_id": np.array(out_ids, dtype=np.int64),
            "n_shared_ngrams": np.array(out_counts, dtype=np.int64),
        }
    )


def ccnet_buckets_resident(
    ids, texts, n_buckets: int, k: float = 0.5, decimals: int = 4
):
    """Resident twin of ``corpus.ccnet_perplexity_buckets``: identical
    bigram-instance multiset, add-k smoothed corpus counts, per-doc
    AVG of ln((cb+k)/(c1+k*V)) rounded HALF_UP, NTILE over the
    (avg desc, id asc) total order.

    Float discipline: the per-doc average is order-sensitive at the
    last-ulp level (Spark sums in partition order, numpy pairwise), so
    the twin bails (None) whenever any scaled average sits within 1e-7
    of a HALF_UP boundary — two orders wider than the worst
    accumulated summation/ln divergence for document-sized bigram
    counts, so outside the guard both summation orders provably round
    to the same 4-digit value (and the NTILE order compares only the
    ROUNDED averages, tie-broken by id)."""
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.graph import _round_half_up_np

    vocab, doc_codes = _tokenize_corpus(texts)
    V = float(len(vocab))  # countDistinct over ALL docs' tokens
    # bigram instances per doc (docs with >= 2 tokens)
    live, pa, pb = [], [], []
    for i, codes in enumerate(doc_codes):
        if codes is None or len(codes) < 2:
            continue
        live.append(i)
        pa.append(codes[:-1])
        pb.append(codes[1:])
    empty = pd.DataFrame(
        {
            "doc_id": [],
            "n_bigrams": [],
            "avg_logprob": [],
            "bucket": [],
            "tier": [],
        }
    )
    if not live:
        return empty
    nvoc = len(vocab)
    a = np.concatenate(pa)
    b = np.concatenate(pb)
    code = a * np.int64(nvoc) + b
    ucode, inv, ccb = np.unique(code, return_inverse=True, return_counts=True)
    c1 = np.bincount(a, minlength=nvoc)
    # lp per distinct bigram: ln((cb + k) / (c1 + k*V)) — same IEEE
    # op order as the Spark expression
    lp_u = np.log(
        (ccb.astype(np.float64) + k)
        / (c1[(ucode // nvoc).astype(np.int64)].astype(np.float64) + k * V)
    )
    lp = lp_u[inv]
    lens = np.array([len(x) for x in pa], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sums = np.add.reduceat(lp, starts)
    avg = sums / lens
    scaled = avg * (10.0 ** decimals)
    frac = np.abs(scaled - np.floor(scaled) - 0.5)
    if len(frac) and float(frac.min()) < 1e-7:
        return None  # AVG order guard (see docstring)
    avg_r = _round_half_up_np(avg, decimals)
    live_ids = ids[np.array(live, dtype=np.int64)]
    # NTILE over (avg desc, id asc)
    order = np.lexsort((live_ids, -avg_r))
    n = len(order)
    base, rem = divmod(n, n_buckets)
    bucket_sorted = np.empty(n, dtype=np.int64)
    pos = 0
    for bkt in range(1, n_buckets + 1):
        size = base + (1 if bkt <= rem else 0)
        bucket_sorted[pos : pos + size] = bkt
        pos += size
    bucket = np.empty(n, dtype=np.int64)
    bucket[order] = bucket_sorted
    if n_buckets == 3:
        tier = np.where(
            bucket == 1, "head", np.where(bucket == 2, "middle", "tail")
        )
    else:
        tier = bucket.astype(str)
    return pd.DataFrame(
        {
            "doc_id": live_ids,
            "n_bigrams": lens,
            "avg_logprob": avg_r,
            "bucket": bucket.astype(np.int32),
            "tier": tier,
        }
    )


def collect_vectors(df: DataFrame, vec_id_col: str, vec_col: str,
                    max_rows: int | None = None):
    """One measured-gate Arrow collect of an embedding frame ->
    ``(ids, matrix)`` (int64 ids, (n, dim) float64).  Returns None on
    any gate miss: non-integral/duplicate/null ids, non-double-array
    vectors, null or ragged vectors, row budget."""
    if max_rows is None:
        max_rows = RESIDENT_DOCS_MAX
    if max_rows <= 0:
        return None
    schema = {f.name: f.dataType for f in df.schema.fields}
    if not isinstance(schema.get(vec_id_col), _INTEGRAL):
        return None
    vt = schema.get(vec_col)
    if not (
        isinstance(vt, T.ArrayType)
        and isinstance(vt.elementType, (T.DoubleType, T.FloatType))
    ):
        # float32 widens to float64 exactly, matching the pandas-UDF
        # _mat conversion; other element types bail
        return None
    v = F.col(vec_col)
    gate = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(vec_id_col).isNull().cast("int")).alias("ni"),
        F.count_distinct(F.col(vec_id_col)).alias("nd"),
        F.sum(v.isNull().cast("int")).alias("nv"),
        F.min(F.size(v)).alias("dmin"),
        F.max(F.size(v)).alias("dmax"),
    ).collect()[0]
    if gate["n"] > max_rows or gate["n"] == 0:
        return None
    if (gate["ni"] or 0) != 0 or gate["nd"] != gate["n"]:
        return None
    if (gate["nv"] or 0) != 0 or gate["dmin"] != gate["dmax"]:
        return None
    import numpy as np

    tbl = df.select(vec_id_col, vec_col).toArrow().combine_chunks()
    ids = tbl.column(0).to_numpy().astype(np.int64, copy=False)
    dim = int(gate["dmin"])
    flat = tbl.column(1).combine_chunks().flatten().to_numpy().astype(
        np.float64, copy=False
    )
    return ids, flat.reshape(len(ids), dim)


def bm25_scores_resident(
    ids, texts, query_terms, k1: float, b: float, ndigits: int
):
    """Resident twin of ``search.bm25_topk``'s scoring (before the
    top-k): per matched doc the ROUNDed Okapi score and the matched-
    term count.  The per-doc contribution sum is the one order-
    sensitive float (Spark sums in row order), so the twin returns
    None whenever any scaled score sits within 1e-6 of a HALF_UP
    boundary — orders wider than the worst ulp drift of a
    query-length sum.  Returns (doc_ids, scores, n_terms) numpy
    arrays."""
    import numpy as np

    from robosystems_spark.operators.graph import _round_half_up_np

    vocab, doc_codes = _tokenize_corpus(texts)
    qset = {t.lower() for t in query_terms}
    qcodes = {i for i, t in enumerate(vocab) if t in qset}
    live = [i for i, c in enumerate(doc_codes) if c is not None]
    if not live:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.float64), e
    dl = np.array([len(doc_codes[i]) for i in live], dtype=np.int64)
    n_docs = float(len(live))
    avgdl = dl.astype(np.float64).mean()
    # per (doc, term in query): tf
    scores = np.zeros(len(live), dtype=np.float64)
    nterm = np.zeros(len(live), dtype=np.int64)
    # document frequency per query code
    tf_maps = []
    dfq: dict[int, int] = {}
    for li_, i in enumerate(live):
        codes = doc_codes[i]
        tfm: dict[int, int] = {}
        for c in codes.tolist():
            if c in qcodes:
                tfm[c] = tfm.get(c, 0) + 1
        tf_maps.append(tfm)
        for c in tfm:
            dfq[c] = dfq.get(c, 0) + 1
    import math

    idf = {
        c: math.log(1.0 + (n_docs - dv + 0.5) / (dv + 0.5))
        for c, dv in dfq.items()
    }
    for li_, tfm in enumerate(tf_maps):
        s = 0.0
        for c, tf in tfm.items():
            tf_norm = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dl[li_] / avgdl)
            )
            s += idf[c] * tf_norm
        scores[li_] = s
        nterm[li_] = len(tfm)
    matched = nterm > 0
    sc = scores[matched]
    scaled = sc * (10.0 ** ndigits)
    frac = np.abs(scaled - np.floor(scaled) - 0.5)
    if len(frac) and float(frac.min()) < 1e-6:
        return None  # rounding-boundary guard (see docstring)
    return (
        np.array([ids[i] for i in live], dtype=np.int64)[matched],
        _round_half_up_np(sc, ndigits),
        nterm[matched],
    )


def source_kl_resident(texts, sources, decimals: int = 6):
    """Resident twin of the per-source KL entry: per-(source, token)
    counts, marginals, the 1e-9 integer ln lattice (guarded), exact
    BIGINT contribution sums, one HALF_UP-rounded division per source.
    Returns pandas (source, n_tokens, s->kl) or None (ln guard)."""
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.graph import _round_half_up_np

    vocab, doc_codes = _tokenize_corpus(texts)
    src_vals: list = []
    src_idx: dict = {}
    rows_s, rows_t = [], []
    for i, codes in enumerate(doc_codes):
        if codes is None:
            continue
        sv = sources[i]
        j = src_idx.get(sv)
        if j is None:
            j = len(src_vals)
            src_idx[sv] = j
            src_vals.append(sv)
        rows_s.append(np.full(len(codes), j, dtype=np.int64))
        rows_t.append(codes)
    empty = pd.DataFrame(
        {"source": [], "n_tokens": [], "kl_to_corpus": []}
    ).astype({"source": "object", "n_tokens": "int64",
              "kl_to_corpus": "float64"})
    if not rows_s:
        return empty
    sarr = np.concatenate(rows_s)
    tarr = np.concatenate(rows_t)
    V = len(vocab)
    code, c = np.unique(sarr * np.int64(V) + tarr, return_counts=True)
    cs = (code // V).astype(np.int64)
    ct = (code % V).astype(np.int64)
    c = c.astype(np.int64)
    gc = np.zeros(V, dtype=np.int64)
    np.add.at(gc, ct, c)
    ns = np.zeros(len(src_vals), dtype=np.int64)
    np.add.at(ns, cs, c)
    tn = int(gc.sum())
    args = np.unique(
        np.concatenate([c, ns[cs], gc[ct], np.array([tn], dtype=np.int64)])
    )
    sl_vals = _ln_lattice(np.log(args.astype(np.float64)), 1e9)
    if sl_vals is None:
        return None
    sl = dict(zip(args.tolist(), sl_vals.astype(np.int64).tolist()))
    term = (
        np.array([sl[x] for x in c.tolist()], dtype=np.int64)
        - np.array([sl[x] for x in ns[cs].tolist()], dtype=np.int64)
        - np.array([sl[x] for x in gc[ct].tolist()], dtype=np.int64)
        + sl[tn]
    )
    s = np.zeros(len(src_vals), dtype=np.int64)
    np.add.at(s, cs, c * term)
    kl = _round_half_up_np(
        s.astype(np.float64) / (1e9 * ns.astype(np.float64)), decimals
    )
    return pd.DataFrame(
        {
            "source": pd.Series(src_vals, dtype=object),
            "n_tokens": ns,
            "kl_to_corpus": kl,
        }
    )


def tfidf_top_resident(ids, texts, n_docs: int, decimals: int = 6):
    """Resident twin of ``text_tfidf_top_term``: integer tf/df,
    tfidf = round(tf * ln(n_docs/df), 6) with the ln boundary guard,
    per-doc argmax over (tfidf desc, term-string asc).  Returns
    pandas (doc_id, top_term, tfidf) or None (guard)."""
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.graph import _round_half_up_np

    vocab, doc_codes = _tokenize_corpus(texts)
    live = [i for i, c in enumerate(doc_codes) if c is not None]
    empty = pd.DataFrame(
        {"doc_id": [], "top_term": [], "tfidf": []}
    ).astype({"doc_id": "int64", "top_term": "object", "tfidf": "float64"})
    if not live:
        return empty
    V = len(vocab)
    doc_rep = np.concatenate(
        [np.full(len(doc_codes[i]), k, dtype=np.int64)
         for k, i in enumerate(live)]
    )
    tok = np.concatenate([doc_codes[i] for i in live])
    code, tf = np.unique(doc_rep * np.int64(V) + tok, return_counts=True)
    cd = (code // V).astype(np.int64)
    ct = (code % V).astype(np.int64)
    tf = tf.astype(np.int64)
    dfq = np.zeros(V, dtype=np.int64)
    np.add.at(dfq, ct, 1)
    raw = tf.astype(np.float64) * np.log(
        float(n_docs) / dfq[ct].astype(np.float64)
    )
    scaled = raw * (10.0 ** decimals)
    frac = np.abs(scaled - np.floor(scaled) - 0.5)
    if len(frac) and float(frac.min()) < 1e-7:
        return None  # ln/product boundary guard
    tfidf = _round_half_up_np(raw, decimals)
    # argmax per doc over (tfidf desc, term-string asc)
    str_rank = np.empty(V, dtype=np.int64)
    str_rank[np.argsort(np.array(vocab, dtype=object))] = np.arange(V)
    order = np.lexsort((str_rank[ct], -tfidf, cd))
    first = np.ones(len(order), dtype=bool)
    first[1:] = cd[order][1:] != cd[order][:-1]
    sel = order[first]
    words = np.array(vocab, dtype=object)
    live_ids = ids[np.array(live, dtype=np.int64)]
    return pd.DataFrame(
        {
            "doc_id": live_ids[cd[sel]],
            "top_term": pd.Series(words[ct[sel]], dtype=object),
            "tfidf": tfidf[sel],
        }
    )
