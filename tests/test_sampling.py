"""Deterministic sampling / sketch / packing queries: statistical and
structural properties beyond the driver's value-hash gate (which only
proves Spark == DuckDB, not that the semantics are right)."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata {SF_DIR} not present"
)


@pytest.fixture(scope="module")
def qmod():
    from neural_locality_sensitive_hashing_spark import queries

    return queries


def test_hash_sample_fraction_and_determinism(spark, qmod):
    docs = qmod.load(spark, SF_DIR, "documents")
    n = docs.count()
    s1 = {r.doc_id for r in qmod.q_doc_sample_hash(spark, SF_DIR).collect()}
    s2 = {r.doc_id for r in qmod.q_doc_sample_hash(spark, SF_DIR).collect()}
    assert s1 == s2  # identical draw across runs — rand(seed) cannot do this
    # Bernoulli(0.1): 3-sigma envelope around n*p
    p = qmod.SAMPLE_FRACTION
    mu, sigma = n * p, (n * p * (1 - p)) ** 0.5
    assert abs(len(s1) - mu) <= 3 * sigma + 1, (len(s1), mu)
    # duplicates sample identically (content hash): every doc sharing text
    # with a sampled doc is itself sampled
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    sampled_texts = {texts[d] for d in s1}
    together = {d for d, t in texts.items() if t in sampled_texts}
    assert together == s1


def test_stratified_quota(spark, qmod):
    from pyspark.sql import functions as F

    rows = qmod.q_lang_stratified_sample(spark, SF_DIR).collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.rk)
    docs = qmod.load(spark, SF_DIR, "documents")
    lang_sizes = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, rks in per_lang.items():
        want = min(qmod.STRATA_QUOTA, lang_sizes[lang])
        assert sorted(rks) == list(range(1, want + 1)), (lang, rks)


def test_kmv_estimate_accuracy(spark, qmod):
    row = qmod.q_distinct_texts_kmv(spark, SF_DIR).first()
    assert row.k == min(qmod.KMV_K, row.exact_distinct)
    # KMV relative error ~ 1/sqrt(K-1); allow 4x that (4/sqrt(63) ~ 0.50)
    rel = abs(row.kmv_estimate - row.exact_distinct) / row.exact_distinct
    assert rel <= 4.0 / (qmod.KMV_K - 1) ** 0.5, (row.kmv_estimate, row.exact_distinct)


def test_packing_respects_budget_and_order(spark, qmod):
    from pyspark.sql import functions as F

    rows = qmod.q_packed_sequences(spark, SF_DIR).collect()
    # deterministic md5 order within shard: recompute the running totals
    docs = qmod.load(spark, SF_DIR, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    order = {r.doc_id: r.h for r in docs.collect()}
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    budget = qmod.PACK_BUDGET_TOKENS
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (order[r.doc_id], r.doc_id))
        cum = 0
        prev_bin = 0
        for r in rs:
            assert r.bin_id == cum // budget, (shard, r.doc_id)
            # monotone, never decreasing; a doc longer than the budget may
            # legitimately SKIP bins, so contiguity is not asserted
            assert r.bin_id >= prev_bin
            prev_bin = r.bin_id
            cum += r.n_tokens


def test_repetition_bounds_and_boilerplate(spark, qmod):
    from pyspark.sql import functions as F

    rep = qmod.q_doc_repetition(spark, SF_DIR)
    bad = rep.where((F.col("repetition") < 0) | (F.col("repetition") > 1)).count()
    assert bad == 0
    # a fully-looped synthetic doc scores near 1, a unique-token doc 0
    looped = " ".join(["a b c d e"] * 50)
    uniq = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, looped), (2, uniq)], "doc_id long, text string"
    )
    from neural_locality_sensitive_hashing_spark.functions import text as T

    sh = T.shingles(T.tokens(F.col("text")), 5)
    out = {
        r.doc_id: r.rep
        for r in df.select(
            "doc_id",
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh), 6
            ).alias("rep"),
        ).collect()
    }
    assert out[1] > 0.9 and out[2] == 0.0
