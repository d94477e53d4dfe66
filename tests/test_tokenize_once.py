"""Plan-shape guards for the round-13 tokenize-once restructure.

Every gram/chunk/shingle operator tokenizes each document EXACTLY once:
the token array is materialized in its own projection below the window
lambda (an in-lambda ``split()`` re-tokenizes per window position —
O(words²) per doc), and per-doc stats are materialized below the
Generate (an expression left in the same select as an explode lands in
the Project ABOVE Generate and re-runs once per exploded row). These
tests pin both properties on the physical plan text, so a refactor that
silently reintroduces the quadratic term fails loudly.
"""
from __future__ import annotations

import contextlib
import io

import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "s0", "en", "aa bb aa cc dd ee ff gg"),
            (1, "s1", "en", "bb bb cc"),
            (2, "s0", "xx", ""),
        ],
        "doc_id long, source string, lang string, text string",
    )


def test_split_runs_once_per_row(spark, docs):
    """Each operator's plan evaluates split() exactly once per scan
    branch (self-joins re-evaluate their subtree, so a plan with N scan
    branches legitimately tokenizes N times — but never MORE than once
    per branch, which is what an in-lambda split() would produce)."""
    from rigatoni_spark.llm import contamination as co
    from rigatoni_spark.llm import corpus as cp
    from rigatoni_spark.llm import dedup as ld
    from rigatoni_spark.llm import minhash as mh
    from rigatoni_spark.llm import textstats as ts

    cases = [
        ("minhash_signatures", mh.minhash_signatures(docs)),
        ("bigram_counts", ts.bigram_counts(docs)),
        ("doc_grams", co._doc_grams(docs, 4)),
        ("repetition_stats", co.repetition_stats(docs)),
        ("top_duplicated_spans", ld.top_duplicated_spans(docs)),
        ("chunk_dedup_stats", ld.chunk_dedup_stats(docs)),
        ("chunk_dedup_clean", ld.chunk_dedup_clean(docs)),
        ("chunk_with_overlap", cp.chunk_with_overlap(docs)),
        ("paragraph_dedup", cp.paragraph_dedup(docs)),
        ("maximal_duplicated_spans", ld.maximal_duplicated_spans(docs)),
    ]
    bad = []
    for name, df in cases:
        p = _plan(df)
        # split(text...) is the document tokenization; splits of other,
        # bounded columns (e.g. an 8-token span) are fine anywhere
        splits, scans = p.count("split(text"), p.count(") Scan")
        if splits > scans:
            bad.append(
                f"{name}: split() appears {splits}x over {scans} scan "
                "branches — an in-lambda or above-Generate re-tokenize"
            )
    assert not bad, "; ".join(bad)


def test_doc_stats_materialize_below_the_generate(spark, docs):
    """Per-doc stats must be computed before the explode, not in the
    Project above Generate (where they re-run per exploded row)."""
    from rigatoni_spark.llm import contamination as co
    from rigatoni_spark.llm import textstats as ts

    p = _plan(co.repetition_stats(docs))
    assert p.index("array_distinct(") < p.index(") Generate"), (
        "repetition_stats: size(array_distinct(toks)) sits above the "
        "Generate — re-evaluated once per bigram row"
    )

    merges = [{"left_sym": "a", "right_sym": "a"}]
    p = _plan(ts.bpe_fertility(docs, merges))
    assert p.index("length(") < p.index(") Generate"), (
        "bpe_fertility: length(text) sits above the Generate — "
        "re-evaluated once per word row"
    )


def test_restructured_operators_still_compute_the_same(spark, docs):
    """Value pin for the edge shapes the plan guards don't see: empty
    doc drops/keeps per operator contract, repeated words, short docs."""
    from rigatoni_spark.llm import contamination as co
    from rigatoni_spark.llm import minhash as mh
    from rigatoni_spark.llm import textstats as ts

    bg = {
        (r["bigram"], r["n"])
        for r in ts.bigram_counts(docs).collect()
    }
    assert ("bb bb", 1) in bg and ("aa bb", 1) in bg

    rep = {
        r["doc_id"]: (r["dup_token_frac_x10k"], r["top_bigram_frac_x10k"])
        for r in co.repetition_stats(docs).collect()
    }
    # doc 0: 8 tokens, 7 distinct -> 1250; 7 bigrams, top 'aa bb'x1+... all 1 -> round(1*10000/7)=1429
    assert rep[0] == (1250, 1429)
    # doc 1: 3 tokens, 2 distinct -> 3333; bigrams 'bb bb','bb cc' -> 5000
    assert rep[1] == (3333, 5000)

    sig = mh.minhash_signatures(docs).collect()
    # one row per doc that has at least one shingle (empty doc's
    # shingle array is [''] -> still one row; pin count only)
    assert len(sig) == 3


def test_toks_materialization_routes_through_the_helper():
    """The invariant is structural, not per-operator (round-14): every
    ``__toks`` projection in the package must come from
    ``tables.tokenize_once``, so a NEW operator written without the
    pattern fails here instead of silently reintroducing the quadratic
    re-tokenize."""
    import os

    import rigatoni_spark

    pkg = os.path.dirname(rigatoni_spark.__file__)
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            if os.path.basename(path) == "tables.py":
                continue  # the helper itself
            with open(path, encoding="utf-8") as fh:
                for i, line in enumerate(fh, 1):
                    if 'alias("__toks")' in line or "alias('__toks')" in line:
                        offenders.append(f"{path}:{i}")
    assert not offenders, (
        "raw __toks materializations outside tables.tokenize_once "
        f"(use the helper): {offenders}"
    )


def test_tokenize_once_helper_matches_manual_projection(spark, docs):
    from pyspark.sql import functions as F

    from rigatoni_spark.tables import tokenize_once

    got = tokenize_once(docs, "doc_id").collect()
    want = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("__toks")
    ).collect()
    assert got == want


def test_tokenize_once_streaming_frame_splits_once(spark, docs, tmp_path):
    """The plan guard extends to STREAMING frames: the same helper on a
    readStream source keeps exactly one split() per scan branch below
    the gram Generate (the stream-decon catalog row's shape)."""
    from pyspark.sql import functions as F

    from rigatoni_spark.llm.contamination import _word_ngrams
    from rigatoni_spark.tables import tokenize_once

    src = str(tmp_path / "docs_feed")
    docs.write.parquet(src)
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    grams = tokenize_once(sdf, "doc_id").select(
        "doc_id",
        F.explode(
            F.array_distinct(_word_ngrams(F.col("__toks"), 4))
        ).alias("gram"),
    )
    p = _plan(grams)
    splits, scans = p.count("split(text"), p.count(") Scan")
    assert 0 < splits <= max(scans, 1), (
        f"streaming frame: split() appears {splits}x over {scans} scan "
        "branches — an in-lambda re-tokenize"
    )
