"""Distributed BPE (byte-pair-encoding) merge training over a corpus.

The tokenizer-training step of an LLM data pipeline: learn the top-N
symbol merges from corpus word frequencies (Sennrich et al. 2016).
The reference engine has no tokenizer trainer — this extends the
engine the way the brief's training-data pipeline requires.

Spark-first shape: the corpus word-frequency count is one distributed
aggregation; each merge iteration is pure window/aggregate work over a
(word, freq, pos, sym) symbol table partitioned by ``word`` — pair
counting is a ``lead`` window + groupBy-sum, greedy merge application
is window arithmetic (no joins), and the only driver traffic per
iteration is ONE row (the argmax pair), exactly like the k-means
centroid collect.  The symbol table is materialize()'d per iteration
to keep lineage flat.  At 100 TB the symbol table is
O(total distinct-word characters) — it shuffles by ``word`` once per
iteration and never grows.

Greedy-merge semantics (textbook): pair counting counts ALL adjacent
occurrences (overlapping included); merge application is greedy
left-to-right, so in a run of k consecutive candidate positions (which
only arises when left==right, e.g. 'a a a a') only the 1st, 3rd, ...
candidates merge.  That parity rule is what the run-grouping windows
below implement, identically in Spark and in the unrolled-CTE DuckDB
oracle (``bpe_oracle_sql``).

PORTABILITY CONTRACT: deterministic argmax tie-break
(count DESC, left ASC, right ASC — binary collation both engines),
integer frequencies throughout — no floating point anywhere, so the
oracle match is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.checkpointing import materialize

END_OF_WORD = "</w>"

_MERGES_SCHEMA = (
    "merge_rank INT, left_sym STRING, right_sym STRING, pair_count BIGINT"
)


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — one
    distributed explode + groupBy; the only stage that touches the
    full corpus."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """Split each distinct word into single-character symbols plus the
    end-of-word marker: (word, freq, pos, sym) with pos dense from 1."""
    syms = F.expr(
        "concat(transform(sequence(1, length(word)), "
        f"i -> substring(word, i, 1)), array('{END_OF_WORD}'))"
    )
    return wf.select(
        "word",
        "freq",
        F.posexplode(syms).alias("p", "sym"),
    ).select("word", "freq", (F.col("p") + 1).alias("pos"), "sym")


def _merge_step(seq: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one learned merge (left, right) -> left||right greedily.

    Window-only (no joins): candidate positions are grouped into runs
    of consecutive positions via the pos - running-candidate-count
    trick; within a run only odd-indexed candidates merge (greedy
    left-to-right); the row after a merged candidate is consumed.
    """
    w = Window.partitionBy("word").orderBy("pos")
    s = seq.withColumn("nxt", F.lead("sym").over(w))
    # eqNullSafe: the last symbol of a word has nxt NULL — candidate
    # must be FALSE there (not NULL), matching the oracle's
    # IS NOT DISTINCT FROM.
    is_cand = F.col("sym").eqNullSafe(F.lit(left)) & F.col("nxt").eqNullSafe(
        F.lit(right)
    )
    s = s.withColumn("cand", is_cand)
    # Running candidate count -> run group key (constant within a run
    # of consecutive candidate positions, distinct across runs).
    # Non-candidates get their own negative key so no partition of the
    # next window is skewed by a giant null group.
    s = s.withColumn(
        "rn_c", F.sum(F.col("cand").cast("int")).over(w)
    ).withColumn(
        "grp",
        F.when(F.col("cand"), F.col("pos") - F.col("rn_c")).otherwise(
            -F.col("pos")
        ),
    )
    in_run = F.row_number().over(
        Window.partitionBy("word", "grp").orderBy("pos")
    )
    s = s.withColumn(
        "keep", F.col("cand") & (in_run % 2 == 1)
    ).withColumn("consumed", F.lag("keep", 1, False).over(w))
    return (
        s.filter(~F.col("consumed"))
        .select(
            "word",
            "freq",
            F.row_number().over(w).alias("pos"),
            F.when(
                F.col("keep"), F.concat(F.col("sym"), F.col("nxt"))
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


# Vocabularies up to this many distinct words train the merge loop on
# a DRIVER-RESIDENT symbol table (one bounded collect of (word, freq)
# after the distributed corpus aggregation): each iteration is a pure-
# integer Python pass instead of a window+argmax Spark job.  The
# symbol table is VOCABULARY-sized, not corpus-sized — but a noisy
# 100 TB crawl can have an unbounded vocabulary, so the distributed
# loop stays the over-gate plan (forced-gate parity pinned in
# tests/test_bpe.py).  Integer-exact: both paths count the same
# multiset and share the (count DESC, left ASC, right ASC) tie-break
# (UTF-8 byte order == codepoint order), so equality is by
# construction, not by tolerance.
_RESIDENT_VOCAB_MAX = 65536


def _resident_merges(
    wf_rows, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The merge loop over a collected (word, freq) vocabulary —
    textbook Sennrich: count ALL adjacent pairs (overlapping
    included), pick argmax with the deterministic tie-break, apply
    greedily left-to-right (which IS the run-parity rule the window
    implementation encodes: in a run of equal candidates the 1st,
    3rd, ... merge and the following symbol is consumed)."""
    words = [
        [int(r["freq"]), list(r["word"]) + [END_OF_WORD]] for r in wf_rows
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for freq, syms in words:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        lr = left + right
        for entry in words:
            syms = entry[1]
            if left not in syms:
                continue
            new = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    new.append(lr)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            entry[1] = new
    return merges


def _seq_from_wf(wf: DataFrame, n_words: int, *, eager: bool = True) -> DataFrame:
    """Initial symbol table from a word-frequency frame, partitioned
    by ``word`` at a width proportional to the vocabulary (the symbol
    table is O(distinct-word chars), tiny relative to the corpus — a
    32-way shuffle of 200 rows costs more in task scheduling than the
    work)."""
    parallelism = wf.sparkSession.sparkContext.defaultParallelism
    parts = max(1, min(parallelism, n_words // 4096 + 1))
    seq = _initial_symbols(wf).repartition(parts, "word")
    return materialize(seq, eager=eager)


def _training_seq(docs: DataFrame, text_col: str) -> DataFrame:
    wf = word_frequencies(docs, text_col)
    return _seq_from_wf(wf, wf.count())


def _train_loop(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
    resident_max: int = _RESIDENT_VOCAB_MAX,
    build_seq: bool = True,
) -> tuple[DataFrame | None, list[tuple[int, str, str, int]]]:
    """Shared training loop: returns (final symbol table, merges).

    Tier dispatch on the measured vocabulary size (r12): within
    ``resident_max`` the merges come from one bounded collect +
    :func:`_resident_merges` (zero per-iteration jobs).  Above the
    gate, the distributed loop: per iteration ONE argmax job (which
    also materializes the previous iteration's lazy checkpoint) + one
    driver row.

    ``build_seq=False`` (the ``bpe_train`` path, which consumes only
    the merges) skips CONSTRUCTING the merge-applied symbol chain and
    returns ``(None, merges)``: the chain is 3 window expressions per
    merge and even un-executed its per-DataFrame analysis cost ~2 s of
    driver time at 8 merges — measured 2.35 -> 0.55 s for the whole
    train loop (guide §7.3: very large plans spend their time in
    analysis, so don't build plans nobody runs)."""
    wf = materialize(word_frequencies(docs, text_col))
    n_words = wf.count()
    if n_words <= resident_max:
        merges = _resident_merges(wf.collect(), n_merges)
        if not build_seq:
            return None, merges
        seq = _seq_from_wf(wf, n_words, eager=False)
        for i, (_rank, left, right, _cnt) in enumerate(merges, 1):
            seq = _merge_step(seq, left, right)
            if i % 2 == 0:
                seq = materialize(seq, eager=False)
        return seq, merges
    seq = _seq_from_wf(wf, n_words)
    w = Window.partitionBy("word").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            seq.withColumn("nxt", F.lead("sym").over(w))
            .filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("sym"), F.asc("nxt"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["sym"], top[0]["nxt"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        # Lazy checkpoint: truncates lineage without its own job — the
        # next iteration's argmax (or the final aggregate) materializes it.
        seq = _merge_step(seq, left, right).transform(materialize, eager=False)
    return seq, merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the trained merge table
    (merge_rank, left_sym, right_sym, pair_count) ordered by rank —
    the artifact a tokenizer ships.  Stops early if pairs run dry."""
    spark = docs.sparkSession
    _, merges = _train_loop(docs, n_merges, text_col, build_seq=False)
    return spark.createDataFrame(merges, _MERGES_SCHEMA)


def bpe_apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a TRAINED merge list to the corpus vocabulary — the
    encode path: no argmax collects, all merge steps chain into one
    lazily-checkpointed plan, so tokenizing with a known tokenizer is
    a single job regardless of merge count."""
    seq = _training_seq(docs, text_col)
    for i, (left, right) in enumerate(merges, 1):
        seq = _merge_step(seq, left, right)
        if i % 2 == 0:
            # Truncate the 3-windows-per-merge plan growth without
            # spending a job: lazy checkpoint.
            seq = seq.transform(materialize, eager=False)
    return seq


def _resident_word_tokens(wf_rows, merges):
    """Final symbol sequence per word after greedily applying
    ``merges`` left-to-right (the same parity rule as
    :func:`_merge_step`): list of (word, freq, syms)."""
    out = []
    for r in wf_rows:
        syms = list(r["word"]) + [END_OF_WORD]
        for left, right in merges:
            if left not in syms:
                continue
            lr = left + right
            new = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    new.append(lr)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out.append((r["word"], int(r["freq"]), syms))
    return out


def bpe_vocab(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    resident_max: int = _RESIDENT_VOCAB_MAX,
) -> DataFrame:
    """The symbol vocabulary AFTER applying the learned merges:
    (sym, total_freq, n_words) — what the trained tokenizer's unit
    inventory looks like over this corpus.  Pass ``merges`` (from a
    prior ``bpe_train``) to skip retraining.

    Tier dispatch on measured vocabulary size (r12): within
    ``resident_max`` the merge application AND the final aggregation
    run on the collected vocabulary (pure integer arithmetic — the
    lazy 3-windows-per-merge chain cost ~5s of exchange overhead at
    sf0.1 for a 31-word vocabulary); the distributed chain is
    unchanged above the gate (forced-gate parity in tests)."""
    wf = materialize(word_frequencies(docs, text_col))
    n_words = wf.count()
    if n_words <= resident_max:
        rows = wf.collect()
        if merges is None:
            merges = [
                (left, right)
                for _rank, left, right, _cnt in _resident_merges(
                    rows, n_merges
                )
            ]
        total: dict[str, int] = {}
        nw: dict[str, int] = {}
        for _word, freq, syms in _resident_word_tokens(rows, merges):
            for s in syms:
                total[s] = total.get(s, 0) + freq
            for s in set(syms):
                nw[s] = nw.get(s, 0) + 1
        return docs.sparkSession.createDataFrame(
            [(s, total[s], nw[s]) for s in sorted(total)],
            "sym STRING, total_freq BIGINT, n_words BIGINT",
        )
    if merges is None:
        seq, _ = _train_loop(docs, n_merges, text_col)
    else:
        seq = bpe_apply_merges(docs, merges, text_col)
    return (
        seq.groupBy("sym")
        .agg(
            F.sum("freq").alias("total_freq"),
            F.countDistinct("word").alias("n_words"),
        )
        .select("sym", "total_freq", "n_words")
    )


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document token count under the trained BPE tokenizer:
    (doc_id, n_words, n_bpe_tokens) — the 'how many tokens is my
    corpus' question every training-data budget starts with.  The
    per-word token count is computed once on the vocabulary and
    joined to the exploded corpus words (broadcast under a measured
    4M-row gate — vocabulary is unbounded at corpus scale — shuffle
    join on the word key above it), so the corpus itself never
    re-tokenizes.  Within the resident vocabulary gate (r12) the
    per-word token counts come straight from the collected vocabulary
    (integer-exact), skipping the merge-chain execution; the corpus
    explode + join + per-doc aggregation stays distributed either
    way."""
    wf = materialize(word_frequencies(docs, text_col))
    n_words = wf.count()
    if n_words <= _RESIDENT_VOCAB_MAX:
        rows = wf.collect()
        eff = merges
        if eff is None:
            eff = [
                (left, right)
                for _rank, left, right, _cnt in _resident_merges(
                    rows, n_merges
                )
            ]
        per_word_bc = F.broadcast(
            docs.sparkSession.createDataFrame(
                [
                    (word, len(syms))
                    for word, _freq, syms in _resident_word_tokens(rows, eff)
                ],
                "word STRING, n_toks BIGINT",
            )
        )
    else:
        if merges is None:
            seq, _ = _train_loop(docs, n_merges, text_col)
        else:
            seq = bpe_apply_merges(docs, merges, text_col)
        # per_word is vocabulary-sized (unbounded at corpus scale):
        # materialize once (it feeds the gate count AND the join) and
        # broadcast only under the measured cap
        per_word = materialize(
            seq.groupBy("word").agg(F.count("*").alias("n_toks"))
        )
        per_word_bc = (
            F.broadcast(per_word)
            if per_word.count() <= 4_000_000
            else per_word
        )
    doc_words = docs.select(
        id_col,
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    return (
        doc_words.join(per_word_bc, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_toks").alias("n_bpe_tokens"),
        )
        .select(id_col, "n_words", "n_bpe_tokens")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: the identical computation as one unrolled CTE chain.
# ---------------------------------------------------------------------------


def _iteration_ctes(k: int, prev: str) -> tuple[list[str], str]:
    """CTE blocks for merge iteration ``k`` reading symbol table
    ``prev``; returns (blocks, name of the new symbol table)."""
    blocks = [
        f"""nx{k} AS MATERIALIZED (
  SELECT word, freq, pos, sym,
         LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM {prev}
)""",
        f"""best{k} AS MATERIALIZED (
  SELECT sym AS a, nxt AS b, SUM(freq) AS cnt
  FROM nx{k} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt
  ORDER BY cnt DESC, a ASC, b ASC
  LIMIT 1
)""",
        f"""mk{k} AS MATERIALIZED (
  SELECT word, freq, pos, sym, nxt,
         CASE WHEN cand THEN pos - rn_c ELSE -pos END AS grp, cand
  FROM (
    -- LEFT JOIN ON TRUE (not CROSS JOIN): when the corpus runs dry
    -- before n_merges, best{k} is EMPTY and a cross join would erase
    -- the symbol table; with b.a NULL every cand is FALSE and the
    -- table carries forward unchanged, matching the Spark loop's
    -- early break.
    SELECT n.*, (b.a IS NOT NULL AND n.sym = b.a
                 AND n.nxt IS NOT DISTINCT FROM b.b) AS cand,
           SUM(CASE WHEN b.a IS NOT NULL AND n.sym = b.a
                     AND n.nxt IS NOT DISTINCT FROM b.b
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY n.word ORDER BY n.pos) AS rn_c
    FROM nx{k} n LEFT JOIN best{k} b ON TRUE
  )
)""",
        f"""kp{k} AS MATERIALIZED (
  SELECT word, freq, pos, sym, nxt,
         cand AND (ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY pos)
                   % 2 = 1) AS keep
  FROM mk{k}
)""",
        f"""seq{k} AS MATERIALIZED (
  SELECT word, freq,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT *, COALESCE(LAG(keep) OVER (PARTITION BY word ORDER BY pos),
                       FALSE) AS consumed
    FROM kp{k}
  ) WHERE NOT consumed
)""",
    ]
    return blocks, f"seq{k}"


def _base_ctes(table: str, text_col: str) -> list[str]:
    return [
        f"""wf AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM({text_col})), '\\s+')) AS word
    FROM {table}
  ) WHERE word <> '' GROUP BY word
)""",
        f"""seq0 AS MATERIALIZED (
  SELECT word, freq, u.pos + 1 AS pos, u.sym FROM (
    SELECT word, freq,
           UNNEST(list_transform(
             list_append(
               LIST_TRANSFORM(GENERATE_SERIES(1, LEN(word)),
                              i -> SUBSTR(word, i, 1)),
               '{END_OF_WORD}'),
             (x, i) -> {{'pos': i - 1, 'sym': x}})) AS u
    FROM wf
  )
)""",
    ]


def bpe_oracle_sql(
    n_merges: int = 8,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "merges",
) -> str:
    """DuckDB SQL computing the identical result: the training loop
    unrolled into ``n_merges`` chained (lead -> argmax -> run-parity
    merge -> renumber) CTE blocks with the same tie-break and greedy
    semantics.  ``mode``: 'merges' (the trained merge table), 'vocab'
    (final symbol inventory), or 'token_counts' (per-document token
    counts under the trained tokenizer)."""
    parts = _base_ctes(table, text_col)
    prev = "seq0"
    for k in range(1, n_merges + 1):
        blocks, prev = _iteration_ctes(k, prev)
        parts.extend(blocks)
    if mode == "vocab":
        select = (
            f"SELECT sym, CAST(SUM(freq) AS BIGINT) AS total_freq,\n"
            f"       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words\n"
            f"FROM {prev} GROUP BY sym"
        )
    elif mode == "token_counts":
        parts.append(
            f"""per_word AS MATERIALIZED (
  SELECT word, COUNT(*) AS n_toks FROM {prev} GROUP BY word
),
doc_words AS (
  SELECT {id_col}, word FROM (
    SELECT {id_col},
           UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM({text_col})), '\\s+')) AS word
    FROM {table}
  ) WHERE word <> ''
)"""
        )
        select = (
            f"SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_words,\n"
            f"       CAST(SUM(n_toks) AS BIGINT) AS n_bpe_tokens\n"
            f"FROM doc_words JOIN per_word USING (word) GROUP BY {id_col}"
        )
    elif mode == "merges":
        select = "\nUNION ALL\n".join(
            f"SELECT {k} AS merge_rank, a AS left_sym, b AS right_sym, "
            f"CAST(cnt AS BIGINT) AS pair_count FROM best{k}"
            for k in range(1, n_merges + 1)
        )
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    return "WITH " + ",\n".join(parts) + "\n" + select
