"""Hand-computed semantics for the PII-redaction, context-chunking and
sequence-packing operators (the oracle gate covers engine equivalence;
these pin the intended behavior on tiny explicit fixtures)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from robosystems_spark.operators.corpus import pack_sequences
from robosystems_spark.operators.text import chunk_documents, redact_pii


def test_redact_pii_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org ssn 123-45-6789 ph 555-867-5309"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_ssns"], rows[1]["n_phones"]) == (2, 1, 1)
    assert (rows[2]["n_emails"], rows[2]["n_ssns"], rows[2]["n_phones"]) == (0, 0, 0)
    expected = "mail <EMAIL> and <EMAIL> ssn <SSN> ph <PHONE>"
    assert rows[1]["redacted_len"] == len(expected)
    assert rows[1]["redacted_hash"] == hashlib.md5(expected.encode()).hexdigest()
    # clean text passes through byte-identical
    assert rows[2]["redacted_hash"] == hashlib.md5(b"no pii here at all").hexdigest()


def test_chunk_documents_windows_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, window=4, stride=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 0,3,6,9 -> sizes 4,4,4,1
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 1]
    first = " ".join(f"w{i}" for i in range(4))
    assert out[0]["chunk_hash"] == hashlib.md5(first.encode()).hexdigest()
    assert out[3]["chunk_hash"] == hashlib.md5(b"w9").hexdigest()


def test_pack_sequences_greedy_rule(spark):
    # token counts per doc: 4, 5, 3, 10, 2 with capacity 10
    docs = [
        (0, "a " * 4),
        (1, "b " * 5),
        (2, "c " * 3),
        (3, "d " * 10),
        (4, "e " * 2),
    ]
    df = spark.createDataFrame(
        [(i, t.strip(), "s1") for i, t in docs], "doc_id long, text string, source string"
    )
    out = {
        r["doc_id"]: r["seq_idx"]
        for r in pack_sequences(df, capacity=10).collect()
    }
    # greedy: [4] fill=4; +5=9 stays; +3=12>10 -> new; 10 -> new; +2 -> new
    assert out == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}


def test_pack_sequences_groups_independent(spark):
    df = spark.createDataFrame(
        [(0, "x " * 8, "a"), (1, "y " * 8, "b"), (2, "z " * 8, "a")],
        "doc_id long, text string, source string",
    )
    rows = pack_sequences(df, capacity=10).collect()
    by_src = {(r["source"], r["doc_id"]): r["seq_idx"] for r in rows}
    # 8+8 > 10 within source a -> two sequences; source b restarts at 0
    assert by_src == {("a", 0): 0, ("a", 2): 1, ("b", 1): 0}


def test_chunking_plan_stays_jvm_side(spark, sf_dir):
    from robosystems_spark.io import read_table

    df = chunk_documents(read_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_pii_overlapping_spans_counts_match_substitutions(spark):
    """Adversarial overlap: the SSN replacement consumes digits the
    phone pattern would have matched on the ORIGINAL text; staged
    counting must report only what was actually substituted."""
    df = spark.createDataFrame(
        [(1, "x 111-22-3333-444-5555 y")], "doc_id long, text string"
    )
    r = redact_pii(df).collect()[0]
    assert r["n_ssns"] == 1
    # after the SSN substitution no phone-shaped span remains
    assert r["n_phones"] == 0
    expected = "x <SSN>-444-5555 y"
    assert r["redacted_len"] == len(expected)
    import hashlib as _h

    assert r["redacted_hash"] == _h.md5(expected.encode()).hexdigest()


def test_pack_sequences_accepts_string_ids(spark):
    from robosystems_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [("doc-a", "x " * 6, "s"), ("doc-b", "y " * 6, "s")],
        "doc_id string, text string, source string",
    )
    out = {r["doc_id"]: r["seq_idx"] for r in pack_sequences(df, capacity=10).collect()}
    assert out == {"doc-a": 0, "doc-b": 1}


def test_quantization_error_profile_bounds(spark, sf_dir):
    """Max reconstruction error of min-max quantization is bounded by
    half a quantization step; endpoints reconstruct exactly."""
    from robosystems_spark.io import read_table
    from robosystems_spark.operators.similarity import quantization_error_profile

    emb = read_table(spark, sf_dir, "embeddings")
    out = quantization_error_profile(emb)
    import pyspark.sql.functions as F

    vals = emb.select(F.posexplode("embedding").alias("p", "x")).agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    ).collect()[0]
    half_step = (vals["mx"] - vals["mn"]) / 255 / 2
    worst = out.agg(F.max("max_abs_err")).collect()[0][0]
    assert worst <= half_step + 5e-7  # reported errors are rounded to 6dp
    assert out.filter("n_dims <> 64").count() == 0


def test_top_ngrams_plan_is_take_ordered(spark, sf_dir):
    from robosystems_spark.io import read_table
    from robosystems_spark.operators.corpus import top_ngrams

    df = top_ngrams(read_table(spark, sf_dir, "documents"), n=2, k=50)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k never globally sorts
    rows = df.collect()
    assert len(rows) == 50
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bigram_logprob_semantics(spark):
    """Repeated bigrams score higher than rare ones; <2-token docs drop."""
    from robosystems_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),       # "the cat" repeats corpus-wide
            (2, "the cat ran"),
            (3, "zeb qux"),           # unique bigram
            (4, "solo"),              # no bigram -> dropped
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bigrams"] == 2
    # doc 3's only bigram is unseen elsewhere -> lowest avg logprob
    assert out[3]["avg_logprob"] < out[1]["avg_logprob"]
    assert all(r["avg_logprob"] < 0 for r in out.values())


def test_vocab_prune_preserves_order_and_counts(spark):
    from robosystems_spark.operators.corpus import vocab_prune

    df = spark.createDataFrame(
        [
            (1, "common rare1 common mid"),
            (2, "common mid zzz"),
            (3, "common mid"),
            (4, "common onlyhere"),
        ],
        "doc_id long, text string",
    )
    # n_docs=4, max_df_frac=0.5 -> keep df in [2, 2]: 'mid' (df=3 is out,
    # wait: 0.5*4=2, so df<=2) -> 'mid' has df 3 -> dropped; 'common' df 4
    # dropped; singletons dropped. Use min_df=2, max_df=0.75 -> keep df in
    # [2, 3]: 'mid' kept, 'common' (4) dropped, singletons dropped.
    out = {
        r["doc_id"]: (r["kept_text"], r["n_kept"], r["n_removed"])
        for r in vocab_prune(df, max_df_frac=0.75, min_df=2).collect()
    }
    assert out[1] == ("mid", 1, 3)
    assert out[2] == ("mid", 1, 2)
    assert out[3] == ("mid", 1, 1)
    assert out[4] == ("", 0, 2)  # every token out of band -> empty doc


def test_embedding_covariance_shape_and_symmetric_diagonal(spark, sf_dir):
    import numpy as np

    from robosystems_spark.operators.projection import embedding_covariance

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = embedding_covariance(emb, dim=64).collect()
    assert len(rows) == 64 * 65 // 2  # upper triangle incl. diagonal
    cov = {(r["dim_i"], r["dim_j"]): r["cov"] for r in rows}
    # diagonal = variances: non-negative
    assert all(cov[(i, i)] >= 0 for i in range(64))
    # spot-check against numpy on the collected column
    A = np.array([r["embedding"] for r in emb.select("embedding").collect()],
                 dtype=np.float64)
    C = np.cov(A, rowvar=False, bias=True)
    for (i, j) in [(0, 0), (0, 1), (5, 63), (63, 63)]:
        assert abs(cov[(i, j)] - C[i, j]) < 1e-5


def test_pca_power_matches_numpy_eig(spark):
    """pc1 from the power iteration agrees with numpy's exact dominant
    eigenvector projection (up to global sign) on anisotropic data."""
    import numpy as np

    from robosystems_spark.operators.projection import pca_power_projection

    rng = np.random.RandomState(7)
    # Strongly anisotropic: dominant direction has 10x the variance.
    base = rng.standard_normal((200, 4)) * np.array([10.0, 2.0, 1.0, 0.5])
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        r["vec_id"]: r["pc1"]
        for r in pca_power_projection(emb, dim=4, iters=12).collect()
    }
    X = base - base.mean(axis=0)
    C = np.cov(base.T, bias=True)
    vals, vecs = np.linalg.eigh(C)
    v = vecs[:, -1]
    ref = X @ v
    got_arr = np.array([got[i] for i in range(200)])
    # Sign of the power-iteration limit is data-dependent; compare both.
    err = min(
        np.abs(got_arr - ref).max(), np.abs(got_arr + ref).max()
    )
    assert err < 1e-3, err


def test_pca_power_zero_signal_raises(spark):
    import pytest as _pytest

    from robosystems_spark.operators.projection import pca_power_projection

    rows = [(i, [1.0, 1.0]) for i in range(5)]  # zero variance
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    with _pytest.raises(ValueError):
        pca_power_projection(emb, dim=2, iters=3).collect()


def test_table_profile_counts(spark):
    from robosystems_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "a", 2.5), (None, None, 2.5)],
        "k BIGINT, s STRING, v DOUBLE",
    )
    prof = {r["column"]: r for r in table_profile(df).collect()}
    assert prof["k"]["n_null"] == 1 and prof["k"]["n_distinct"] == 3
    assert prof["s"]["min_value"] == "a" and prof["s"]["max_value"] == "b"
    assert prof["v"]["n_null"] == 1 and prof["v"]["n_distinct"] == 2
    assert all(r["n_rows"] == 4 for r in prof.values())


def test_numeric_histogram_bins(spark):
    import pytest as _pytest

    from robosystems_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame(
        [(float(x),) for x in range(100)], "x DOUBLE"
    )
    out = {r["bin"]: r for r in numeric_histogram(df, "x", n_bins=10).collect()}
    assert len(out) == 10
    assert all(r["n_rows"] == 10 for r in out.values())
    assert out[0]["lo"] == 0.0 and out[9]["hi"] == 99.0
    with _pytest.raises(ValueError):
        numeric_histogram(
            spark.createDataFrame([(1.0,), (1.0,)], "x DOUBLE"), "x"
        ).collect()


def test_trigram_interpolated_logprob_properties(spark):
    from robosystems_spark.operators.text import trigram_interpolated_logprob

    rows = [
        (1, "a b c a b c a b c"),     # highly predictable
        (2, "p q r s t u v w x"),     # every trigram unique
        (3, "one two"),               # < 3 tokens -> drops out
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in trigram_interpolated_logprob(docs).collect()}
    assert 3 not in out
    assert out[1]["n_trigrams"] == 7 and out[2]["n_trigrams"] == 7
    # Repetitive text is more probable under the corpus-trained model.
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
    # Probabilities are proper: avg log p < 0.
    assert out[1]["avg_logprob"] < 0


def test_pca_top3_matches_numpy_eig(spark):
    """Deflated power iteration recovers the top-3 eigenvector
    projections (up to per-component sign) on well-separated spectra."""
    import numpy as np

    from robosystems_spark.operators.projection import pca_power_components

    rng = np.random.RandomState(3)
    base = rng.standard_normal((300, 5)) * np.array([12.0, 6.0, 3.0, 0.8, 0.3])
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"], r["pc3"])
        for r in pca_power_components(
            emb, dim=5, n_components=3, iters=20
        ).collect()
    }
    X = base - base.mean(axis=0)
    C = np.cov(base.T, bias=True)
    _, vecs = np.linalg.eigh(C)
    for comp_idx, col in enumerate(range(1, 4)):
        v = vecs[:, -col]  # eigh ascending -> top is last
        ref = X @ v
        arr = np.array([got[i][comp_idx] for i in range(300)])
        err = min(np.abs(arr - ref).max(), np.abs(arr + ref).max())
        assert err < 5e-3, (comp_idx, err)


def test_ppmi_similarity_groups_words_by_shared_contexts(spark):
    """Two words that occur in identical contexts must be each
    other's top cosine match; a word with disjoint contexts must not
    pair highly with them."""
    from robosystems_spark.operators.corpus import ppmi_word_similarity

    # 'cat' and 'dog' share contexts (pet ... food); 'rocket' lives in
    # a disjoint context world (launch ... space).
    a = "pet cat food home pet cat food home pet cat food home"
    b = "pet dog food home pet dog food home pet dog food home"
    c = "launch rocket space orbit launch rocket space orbit launch rocket space orbit"
    docs = spark.createDataFrame(
        [(i, a) for i in range(10)]
        + [(100 + i, b) for i in range(10)]
        + [(200 + i, c) for i in range(10)],
        "doc_id LONG, text STRING",
    )
    out = ppmi_word_similarity(docs, k=100, min_count=5).collect()
    sims = {(r["w1"], r["w2"]): r["cosine"] for r in out}
    cat_dog = sims.get(("cat", "dog"), 0.0)
    assert cat_dog > 0.8
    for w in ("cat", "dog"):
        pair = tuple(sorted((w, "rocket")))
        assert sims.get(pair, 0.0) < cat_dog


def test_vocab_prune_boundary_cutoff_matches_oracle_semantics(spark):
    """Odd corpus size + a token whose df sits exactly on the max-df
    boundary: Spark's int() truncation and the oracle's
    CAST(FLOOR(...) AS BIGINT) must agree (plain CAST in DuckDB
    rounds half-up and would admit one extra token for odd n)."""
    import duckdb

    from robosystems_spark.inventory import REGISTRY, _ensure_loaded
    from robosystems_spark.operators.corpus import vocab_prune

    _ensure_loaded()
    # n=5 docs, max_df_frac=0.5 -> cutoff int(2.5)=2.  Token "edge"
    # appears in exactly 3 docs (df=3 > 2: pruned under truncation,
    # KEPT under round-half-up: 3 <= round(2.5)=3) — the divergence.
    rows = [
        ("d1", "edge alpha alpha"),
        ("d2", "edge beta alpha"),
        ("d3", "edge beta gamma"),
        ("d4", "gamma delta unique1"),
        ("d5", "delta unique2 unique3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["kept_text"], r["n_kept"], r["n_removed"])
        for r in vocab_prune(df, max_df_frac=0.5, min_df=2).collect()
    }
    # edge (df=3) pruned; alpha (2), beta (2), gamma (2), delta (2) kept
    assert out["d1"] == ("alpha alpha", 2, 1)
    assert out["d2"] == ("beta alpha", 2, 1)
    assert out["d3"] == ("beta gamma", 2, 1)
    # oracle SQL on the same 5 docs must match exactly
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(REGISTRY["corpus_vocab_prune"].oracle).fetchall()
    }
    assert oracle == out


def test_ppmi_hot_context_cap_bounds_matmul_and_matches_oracle(spark):
    """Skew fixture: one stop-word context co-occurs with every word.
    With a tiny max_context_degree the hot context is dropped from the
    sparse matmul AND the norms on both engines (hash parity), and the
    self-join side is provably degree-bounded."""
    import random

    import duckdb
    import pandas as pd

    from robosystems_spark.operators.corpus import (
        ppmi_word_similarity,
        ppmi_word_similarity_oracle_sql,
    )

    random.seed(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(60):
        toks = []
        for _ in range(12):
            toks.append(random.choice(vocab))
            toks.append("the")  # the hot context: adjacent to everything
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    kw = dict(k=200, min_count=5, max_context_degree=8)
    out = sorted(
        (r["w1"], r["w2"], r["cosine"])
        for r in ppmi_word_similarity(docs, **kw).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = sorted(
        (r[0], r[1], r[2])
        for r in con.execute(ppmi_word_similarity_oracle_sql(**kw)).fetchall()
    )
    assert out == oracle and len(out) > 0
    # the capped run differs from the uncapped one (the cap really bit)
    uncapped = sorted(
        (r["w1"], r["w2"], r["cosine"])
        for r in ppmi_word_similarity(docs, k=200, min_count=5).collect()
    )
    assert out != uncapped


def test_zipf_fit_recovers_synthetic_power_law(spark):
    """A corpus built with freq(rank) = C/rank must fit slope ~ -1 with
    r2 ~ 1; a uniform-frequency corpus must fit slope ~ 0."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.text import zipf_fit

    C = 1200
    words = []
    for r in range(1, 41):
        words += [f"w{r:02d}"] * (C // r)
    zipf_doc = spark.createDataFrame([(" ".join(words),)], ["text"])
    fit = zipf_fit(zipf_doc, top_n=40).collect()[0]
    assert fit["n_tokens_fit"] == 40
    assert abs(fit["slope"] + 1.0) < 0.05
    assert fit["r2"] > 0.99

    flat_doc = spark.createDataFrame(
        [(" ".join([f"u{r}" for r in range(50)] * 10),)], ["text"]
    )
    flat = zipf_fit(flat_doc, top_n=50).collect()[0]
    assert abs(flat["slope"]) < 0.01


def test_gopher_quality_flags_rules(spark):
    """Each Gopher rule flips the keep/drop bit on a targeted doc."""
    from robosystems_spark.operators.text import gopher_quality_flags

    # 60 words, mean len 4, four distinct required stopwords
    good = " ".join(["the", "have", "with", "that", "word", "token"] * 10)
    short = "the be of"                               # fails word count
    # 60 words of length 1 -> mean_word_len 1 < 3
    thin = " ".join(["a"] * 58 + ["the", "be"])
    # 60 words, >20% numeric-only tokens -> alpha_frac < 0.8
    nums = " ".join(["the", "be", "word"] * 15 + ["123"] * 15)
    # no required stopwords
    nostop = " ".join(["alpha", "beta", "gamma"] * 20)
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, thin), (4, nums), (5, nostop)],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert out[1]["passes_gopher"] is True
    assert out[2]["passes_gopher"] is False and out[2]["n_words"] == 3
    assert out[3]["passes_gopher"] is False
    assert out[3]["mean_word_len"] < 3
    assert out[4]["passes_gopher"] is False
    assert out[4]["alpha_word_frac"] < 0.8
    assert out[5]["passes_gopher"] is False
    assert out[5]["n_required_stopwords"] == 0
    # symbol rule: hashes push the ratio over 0.1
    hashy = good + " " + " ".join(["##"] * 10)
    out2 = gopher_quality_flags(
        spark.createDataFrame([(6, hashy)], "doc_id LONG, text STRING")
    ).collect()[0]
    assert out2["symbol_ratio"] > 0.1 and out2["passes_gopher"] is False


def test_corpus_kl_divergence_zero_for_identical(spark):
    """Two sources with identical unigram distributions -> KL 0;
    a skewed source -> strictly positive."""
    from robosystems_spark.inventory.llm import corpus_source_kl_divergence

    # same text in both sources: each source's distribution equals
    # the corpus distribution exactly
    rows = [
        (i, "alpha beta gamma delta", None, "s1", 0) for i in range(5)
    ] + [
        (i + 10, "alpha beta gamma delta", None, "s2", 0) for i in range(5)
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: r["kl_to_corpus"]
               for r in corpus_source_kl_divergence(spark, d).collect()}
        assert out == {"s1": 0.0, "s2": 0.0}

    skew = [(i, "alpha alpha alpha alpha", None, "s1", 0) for i in range(5)] + [
        (i + 10, "beta gamma delta zeta", None, "s2", 0) for i in range(5)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            skew, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: r["kl_to_corpus"]
               for r in corpus_source_kl_divergence(spark, d).collect()}
        assert out["s1"] > 0.5 and out["s2"] > 0.1


def test_temperature_mixture_closed_form(spark):
    """80/20 split at alpha=0.5: weights proportional to sqrt(p),
    the rare source upsampled, the common one downsampled."""
    import math
    import os
    import tempfile

    from robosystems_spark.inventory.llm import corpus_temperature_mixture

    rows = [(i, "x", None, "big", 0) for i in range(80)] + [
        (i + 100, "x", None, "small", 0) for i in range(20)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: r for r in
               corpus_temperature_mixture(spark, d).collect()}
    den = math.sqrt(0.8) + math.sqrt(0.2)
    assert out["big"]["n_docs"] == 80
    assert abs(out["big"]["weight"] - math.sqrt(0.8) / den) < 1e-6
    assert abs(out["small"]["weight"] - math.sqrt(0.2) / den) < 1e-6
    assert out["small"]["upsample_factor"] > 1.0 > out["big"]["upsample_factor"]


def test_ivf_recall_bounds(spark):
    """recall@10 is in [0, 1], and with every bucket probed IVF
    equals exact search so recall is exactly 1."""
    from robosystems_spark.inventory.llm import _emb  # noqa: F401
    # synthetic embeddings written as a tiny sf dir
    import os
    import random
    import tempfile

    random.seed(7)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(8)], "l0")
        for i in range(40)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label STRING"
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        from pyspark.sql import functions as F

        from robosystems_spark.operators import similarity as S

        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        queries = emb.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = S.cosine_topk(emb, queries, k=5).select("query_id", "nn_id")
        # nprobe == num_centroids: IVF probes everything == exact
        approx = S.ivf_topk(
            emb, queries, k=5, num_centroids=4, nprobe=4
        ).select("query_id", "nn_id")
        hits = exact.join(approx, ["query_id", "nn_id"], "left_semi")
        per_q = {r["query_id"]: r["c"] for r in
                 hits.groupBy("query_id").agg(
                     F.count(F.lit(1)).alias("c")).collect()}
        assert per_q == {0: 5, 1: 5}


def test_dsir_importance_directionality_and_lattice(spark):
    """DSIR (Xie et al. 2023): documents made of target-domain n-grams
    must out-score raw-only documents; the lattice arithmetic makes
    scores engine-exact (driver entry corpus_dsir_importance carries
    the DuckDB twin)."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.corpus import dsir_importance

    rows = [
        # target slice: legal-ish vocabulary
        (1, True, "contract clause liability indemnify party breach"),
        (2, True, "party contract breach clause remedy liability"),
        # raw pool: cooking vocabulary + one target-like raw doc
        (3, False, "simmer onion butter garlic stock season taste"),
        (4, False, "whisk flour butter sugar bake oven cool rack"),
        (5, False, "contract clause liability party breach remedy"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, is_target boolean, text string")
    out = {r["doc_id"]: r["log_importance"]
           for r in dsir_importance(docs).collect()}
    assert len(out) == 5
    # the target-like raw doc (5) scores far above the cooking docs
    assert out[5] > out[3] and out[5] > out[4]
    # and target docs score above raw-only docs
    assert min(out[1], out[2]) > max(out[3], out[4])
    # deterministic: same input -> identical scores
    out2 = {r["doc_id"]: r["log_importance"]
            for r in dsir_importance(docs).collect()}
    assert out == out2


def test_ccnet_buckets_tiers_and_determinism(spark):
    """CCNet tiers (Wenzek et al. 2020): fluent (corpus-typical) docs
    land in the head, rare-vocabulary docs in the tail; equal-size
    NTILE thirds; deterministic under re-run."""
    from robosystems_spark.operators.corpus import ccnet_perplexity_buckets

    fluent = "the model trains on the data and the data feeds the model"
    rows = (
        [(i, fluent) for i in range(4)]
        + [(10 + i, f"zq{i}x vex{i} jolt{i} wub{i} kree{i} plon{i}")
           for i in range(4)]
        + [(20 + i, "the model trains on unusual vex data sometimes")
           for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["tier"], r["bucket"])
           for r in ccnet_perplexity_buckets(docs).collect()}
    assert len(out) == 12
    from collections import Counter

    sizes = Counter(t for t, _ in out.values())
    assert sizes == {"head": 4, "middle": 4, "tail": 4}
    # the rare-vocabulary docs (every bigram unique) must fill the
    # tail; both fluent groups fill head+middle
    assert all(out[10 + i][0] == "tail" for i in range(4))
    assert all(out[i][0] in ("head", "middle") for i in range(4))
    assert all(out[20 + i][0] in ("head", "middle") for i in range(4))
    out2 = {r["doc_id"]: (r["tier"], r["bucket"])
            for r in ccnet_perplexity_buckets(docs).collect()}
    assert out == out2


def test_gopher_repetition_flags_hand_values(spark):
    """Rae et al. 2021 A1.2 on hand-computable docs: char fractions of
    the top {2,3,4}-gram and duplicated {5..10}-grams."""
    from robosystems_spark.operators.text import gopher_repetition_flags

    # "a b a b a b": 2-grams {"a b":3, "b a":2} -> top2 = 3*3 = 9 chars
    # of 11; 3-grams tie at count 2 -> (len, gram) tie-break picks
    # "b a b" (l=5) -> 10/11; all 5..10-grams unique -> dup = 0.
    long_clean = " ".join(f"tok{i:02d}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, long_clean)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_repetition_flags(docs).collect()}
    r1 = rows[1]
    assert r1["rep_top2_frac"] == round(9 / 11, 6)
    assert r1["rep_top3_frac"] == round(10 / 11, 6)
    assert r1["rep_dup5_frac"] == 0.0
    assert r1["rep_dup10_frac"] == 0.0
    assert not r1["passes_repetition"]
    # 60 distinct 5-char tokens: top-n coverage is one occurrence of an
    # (6n-1)-char gram out of 359 chars -> far below every threshold.
    r2 = rows[2]
    assert r2["rep_top4_frac"] == round(23 / 359, 6)
    assert r2["rep_dup5_frac"] == 0.0
    assert r2["passes_repetition"]


def test_gopher_repetition_duplicated_ngram_chars(spark):
    """A repeated 5-gram counts every occurrence's chars in dup5."""
    from robosystems_spark.operators.text import gopher_repetition_flags

    # "p q r s t" appears twice (separated by distinct filler), so
    # dup5 = 2 * len("p q r s t") = 18 chars.
    text = "p q r s t u1 v2 w3 x4 y5 z6 p q r s t"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_repetition_flags(docs).collect()[0]
    total = len(text)
    assert r["rep_dup5_frac"] == round(18 / total, 6)
    # no 6-gram repeats (fillers differ on both sides)
    assert r["rep_dup6_frac"] == 0.0


def test_gopher_repetition_short_and_empty_docs(spark):
    """Docs shorter than n produce zero fractions, never errors."""
    from robosystems_spark.operators.text import gopher_repetition_flags

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_repetition_flags(docs).collect()}
    assert rows[1]["rep_top2_frac"] == 0.0 and rows[1]["passes_repetition"]
    assert rows[2]["rep_top2_frac"] == 0.0
    # "two words": one 2-gram covering all 9 chars -> top2 = 1.0, drop
    assert rows[3]["rep_top2_frac"] == 1.0
    assert not rows[3]["passes_repetition"]


def test_unigram_entropy_closed_forms(spark):
    """H("a a b b") = ln2 with norm 1; single-type docs get H = 0."""
    import math

    from robosystems_spark.operators.text import unigram_entropy

    docs = spark.createDataFrame(
        [(1, "a a b b"), (2, "x x x"), (3, "u v w z")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_entropy(docs).collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_unique_tokens"] == 2
    assert rows[1]["unigram_entropy"] == round(math.log(2), 6)
    assert rows[1]["norm_entropy"] == 1.0
    assert rows[2]["unigram_entropy"] == 0.0
    assert rows[2]["norm_entropy"] == 0.0
    # uniform over 4 types: H = ln 4, norm = 1
    assert rows[3]["unigram_entropy"] == round(math.log(4), 6)
    assert rows[3]["norm_entropy"] == 1.0


def test_random_walks_match_independent_hash_recomputation(spark):
    """The walk corpus is reproducible from the published rule alone:
    recompute every hop with hashlib over the sorted adjacency and
    require exact equality (the cross-engine determinism contract)."""
    import hashlib

    from robosystems_spark.operators.graph import random_walks

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 4), (4, 1)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(1,), (3,)], "s long")
    got = {
        (r["start_node"], r["walk_id"], r["step"]): r["node"]
        for r in random_walks(
            edges, sources, walk_len=4, walks_per_node=3, seed=7
        ).collect()
    }
    adj = {1: [2, 3], 2: [1, 3], 3: [1, 4], 4: [1]}
    expect = {}
    for s in (1, 3):
        for w in range(3):
            v = s
            expect[(s, w, 0)] = v
            for t in range(1, 5):
                h = hashlib.md5(f"7:{s}:{w}:{t}:{v}".encode()).hexdigest()
                v = adj[v][int(h[:15], 16) % len(adj[v])]
                expect[(s, w, t)] = v
    assert got == expect


def test_random_walks_truncate_at_sinks(spark):
    """Walks reaching a node with no out-edges stop there."""
    from robosystems_spark.operators.graph import random_walks

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    sources = spark.createDataFrame([(1,)], "s long")
    rows = random_walks(
        edges, sources, walk_len=5, walks_per_node=1, seed=1
    ).collect()
    # step 0 at node 1, step 1 at node 2 (2 is a sink) - nothing after
    assert {(r["step"], r["node"]) for r in rows} == {(0, 1), (1, 2)}


def test_skipgram_pairs_window_semantics(spark):
    """Pairs count every ordered (center, context) within the window,
    per walk, excluding self-steps."""
    from robosystems_spark.operators.graph import skipgram_pairs

    walks = spark.createDataFrame(
        [(1, 0, 0, 10), (1, 0, 1, 20), (1, 0, 2, 30), (1, 0, 3, 10)],
        "start_node long, walk_id int, step int, node long",
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    # step pairs with |i-j| in {1,2}: (0,1),(0,2),(1,2),(1,3),(2,3)
    # and mirrors; node 10 appears at steps 0 and 3
    assert got[(10, 20)] == 2  # (0,1) and (3,1)
    assert got[(20, 10)] == 2
    assert got[(10, 30)] == 2  # (0,2) and (3,2)
    assert got[(20, 30)] == 1
    assert (10, 10) not in got  # |0-3| = 3 > window


def test_skipgram_negatives_deterministic_and_weighted(spark):
    """Negatives resolve to the node owning md5(...) mod W on the
    cumulative count line: recompute independently with hashlib; a
    zero-count node can never be drawn; re-runs are identical."""
    import hashlib

    from robosystems_spark.operators.graph import skipgram_negatives

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "center long, context long"
    )
    freq = spark.createDataFrame(
        [(10, 5), (20, 1), (30, 4)], "node long, c long"
    )
    # cumulative line ordered by node: 10 -> [0,5), 20 -> [5,6), 30 -> [6,10)
    def owner(h):
        return 10 if h < 5 else (20 if h < 6 else 30)

    got = {
        (r["center"], r["context"], r["neg_rank"]): r["negative"]
        for r in skipgram_negatives(pairs, freq, k=4, seed=9).collect()
    }
    assert len(got) == 8
    for (a, b) in ((1, 2), (2, 3)):
        for j in range(4):
            h = int(
                hashlib.md5(f"9:{a}:{b}:{j}".encode()).hexdigest()[:15], 16
            ) % 10
            assert got[(a, b, j)] == owner(h)
    got2 = {
        (r["center"], r["context"], r["neg_rank"]): r["negative"]
        for r in skipgram_negatives(pairs, freq, k=4, seed=9).collect()
    }
    assert got == got2


def test_skipgram_negatives_bucket_boundaries(spark):
    """Intervals spanning several buckets and intervals inside one
    bucket both resolve (the bucketed interval-join edge cases)."""
    from robosystems_spark.operators.graph import skipgram_negatives

    pairs = spark.createDataFrame([(1, 2)], "center long, context long")
    # one huge interval + two tiny ones, tiny bucket width
    freq = spark.createDataFrame(
        [(1, 1000), (2, 1), (3, 1)], "node long, c long"
    )
    rows = skipgram_negatives(pairs, freq, k=16, seed=3, n_buckets=7).collect()
    assert len(rows) == 16  # every probe resolves to exactly one node
    assert all(r["negative"] in (1, 2, 3) for r in rows)


def test_quality_calibration_bins_accounting(spark):
    """Bins partition the corpus; per-bin means are the exact lattice
    means of the scored frame; p=1.0 lands in the top bin (LEAST
    clamp)."""
    from robosystems_spark.operators.classifier import (
        quality_calibration_bins,
        quality_lr_score,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    scored = quality_lr_score(docs, iters=6, lr=20.0).collect()
    out = quality_calibration_bins(docs, iters=6, lr=20.0).collect()
    assert sum(r["n_docs"] for r in out) == len(scored)
    assert sum(r["n_quality"] for r in out) == sum(r["y"] for r in scored)
    by = {r["bin"]: r for r in out}
    for b, r in by.items():
        assert 0 <= b <= 9
        members = [
            s for s in scored
            if min(int(s["p_quality"] * 10), 9) == b
        ]
        assert r["n_docs"] == len(members)
        want = round(
            sum(round(s["p_quality"] * 1e6) for s in members)
            / 1e6 / len(members), 6,
        )
        assert abs(r["mean_predicted"] - want) < 1e-9


def test_gopher_line_flags_rules(spark):
    """Line-structured Gopher rules on synthetic multi-line docs:
    bullet/ellipsis fractions, duplicate-line and duplicate-line-char
    fractions (every repeat beyond the first counts)."""
    from robosystems_spark.operators.text import gopher_line_flags

    doc1 = "- alpha\n- beta\nplain line\nanother one..."
    # "same line" appears 3x -> 2 duplicate lines of 9 chars each;
    # chars total = 9*3 + 5 = 32
    doc2 = "same line\nsame line\nsame line\nother"
    docs = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, "single")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_line_flags(docs).collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 4
    assert r1["bullet_line_frac"] == 0.5
    assert r1["ellipsis_line_frac"] == 0.25
    assert r1["dup_line_frac"] == 0.0
    assert r1["passes_line_rules"]
    r2 = rows[2]
    assert r2["dup_line_frac"] == 0.5
    assert r2["dup_line_char_frac"] == round(18 / 32, 6)
    assert not r2["passes_line_rules"]
    r3 = rows[3]
    assert r3["n_lines"] == 1 and r3["passes_line_rules"]


def test_gopher_line_flags_blank_lines_ignored(spark):
    """Empty/whitespace lines don't count toward any fraction."""
    from robosystems_spark.operators.text import gopher_line_flags

    docs = spark.createDataFrame(
        [(1, "a\n\n  \nb\n\nc")], "doc_id long, text string"
    )
    r = gopher_line_flags(docs).collect()[0]
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == 0.0


def test_fim_transform_reconstructs_original(spark):
    """PSM pieces reassemble to the original token sequence, the
    unapplied share passes through verbatim, and the apply rate is
    deterministic."""
    from robosystems_spark.operators.corpus import (
        FIM_MID,
        FIM_PRE,
        FIM_SUF,
        fim_transform,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r["doc_id"]: r for r in fim_transform(docs).collect()}
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    applied = [d for d, r in out.items() if r["fim_applied"]]
    assert 0.35 < len(applied) / len(out) < 0.65
    for d, r in out.items():
        if not r["fim_applied"]:
            assert r["fim_text"] == orig[d]
            continue
        t = r["fim_text"]
        assert t.startswith(FIM_PRE)
        pre, rest = t[len(FIM_PRE):].split(FIM_SUF, 1)
        suf, mid = rest.split(FIM_MID, 1)
        rebuilt = " ".join(x for x in (pre, mid, suf) if x)
        assert rebuilt == " ".join(orig[d].lower().strip().split())
    out2 = {r["doc_id"]: r["fim_text"]
            for r in fim_transform(docs).collect()}
    assert out2 == {d: r["fim_text"] for d, r in out.items()}


def test_moore_lewis_directionality(spark):
    """Target-like documents score higher than off-domain ones, and
    the score is exactly the mean per-bigram lattice difference."""
    from robosystems_spark.operators.corpus import moore_lewis_score
    from pyspark.sql import functions as F

    target = "the model trains on the data and the data feeds the model"
    rows = (
        [(i, target, True) for i in range(4)]
        + [(10 + i, "zq vex jolt wub kree plon zq vex jolt wub", False)
           for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )
    out = {r["doc_id"]: r["ml_score"]
           for r in moore_lewis_score(docs).collect()}
    assert min(out[i] for i in range(4)) > max(out[10 + i] for i in range(4))


def test_padding_waste_sorted_never_worse(spark):
    """Length-sorted batching never pads more than arrival order, and
    identical-length corpora pad zero either way."""
    from robosystems_spark.operators.corpus import padding_waste

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = {x["strategy"]: x for x in padding_waste(docs, 8).collect()}
    assert r["sorted"]["n_pad_slots"] <= r["arrival"]["n_pad_slots"]
    assert r["sorted"]["n_tokens"] == r["arrival"]["n_tokens"]

    same = spark.createDataFrame(
        [(i, "a b c d") for i in range(16)], "doc_id long, text string"
    )
    z = {x["strategy"]: x for x in padding_waste(same, 4).collect()}
    assert z["sorted"]["n_pad_slots"] == 0
    assert z["arrival"]["n_pad_slots"] == 0


def test_tokenizer_parity_en_baseline_is_one(spark):
    """The en row's parity ratio is exactly 1 and every language's
    chars_per_token is the ratio of its sums."""
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = {
        r["lang"]: r
        for r in REGISTRY["tokenizer_parity_by_lang"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert rows["en"]["parity_vs_en"] == 1.0
    for r in rows.values():
        assert r["chars_per_token"] == round(
            r["n_chars"] / r["n_bpe_tokens"], 6
        )
