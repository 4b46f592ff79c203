"""PII scrubbing, boilerplate fraction, and host-stats operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.functions import pii

SF_DIR = "/root/testdata/sf0.001"


def test_scrub_literals(spark):
    rows = [
        (0, "mail me at a.b@x.co or 10.1.2.3 thanks"),
        (1, "no pii here at all"),
        (2, "a@b.io then c.d+e@ops.org twice"),
        (3, "ip only 192.168.0.255 end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii.email_count(F.col("text")).alias("ne"),
            pii.ipv4_count(F.col("text")).alias("ni"),
            pii.scrub(F.col("text")).alias("clean"),
        ).collect()
    }
    assert out[0].ne == 1 and out[0].ni == 1
    assert out[0].clean == "mail me at <EMAIL> or <IP> thanks"
    assert out[1].ne == 0 and out[1].ni == 0
    assert out[1].clean == "no pii here at all"
    assert out[2].ne == 2
    assert out[2].clean == "<EMAIL> then <EMAIL> twice"
    assert out[3].ni == 1 and out[3].clean == "ip only <IP> end"


def test_pii_scrub_query_over_planted(spark):
    """The planted PII rows carry exactly one IPv4 and 1-2 emails each;
    the synthetic corpus rows carry none (which is why the planted table
    exists — a corpus-only oracle would be vacuous)."""
    from neural_locality_sensitive_hashing_spark.planted import (
        N_PII_DOCS,
        ensure_planted_pii,
    )
    from neural_locality_sensitive_hashing_spark.queries import q_pii_scrub

    rows = q_pii_scrub(spark, SF_DIR).collect()
    planted = [r for r in rows if r.doc_id >= 20_000_000]
    corpus = [r for r in rows if r.doc_id < 20_000_000]
    assert len(planted) == N_PII_DOCS
    assert all(r.n_ipv4 == 1 for r in planted)
    assert all(r.n_emails >= 1 for r in planted)
    assert {r.doc_id: r.n_emails for r in planted if r.doc_id < 20_000_002} == {
        20_000_000: 2,
        20_000_001: 2,
    }
    assert all(r.n_emails == 0 and r.n_ipv4 == 0 for r in corpus)
    # redaction changed the planted texts (clean_md5 != md5(original))
    orig = {
        r.doc_id: r.m
        for r in spark.read.parquet(ensure_planted_pii(SF_DIR))
        .select("doc_id", F.md5("text").alias("m"))
        .collect()
    }
    assert all(r.clean_md5 != orig[r.doc_id] for r in planted)


def test_boilerplate_fraction_consistent_with_jaccard_pairs(spark):
    """Docs joined by an exact-Jaccard pair share shingles by definition,
    so their shared fraction must be > 0; all fractions lie in [0, 1]."""
    from neural_locality_sensitive_hashing_spark.queries import (
        q_boilerplate_shingles,
        q_ngram_jaccard_pairs,
    )

    frac = {r.doc_id: r for r in q_boilerplate_shingles(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(frac) == docs.count()
    assert all(0.0 <= r.shared_frac <= 1.0 and r.n_shingles >= 1 for r in frac.values())
    paired = set()
    for r in q_ngram_jaccard_pairs(spark, SF_DIR).collect():
        paired |= {r.a, r.b}
    assert paired, "corpus should contain near-dup pairs"
    assert all(frac[d].shared_frac > 0 for d in paired)


def test_crawl_host_stats(spark):
    """7 canonical hosts from the planted variants + the '' bucket for
    schemeless fallback URLs; crawl counts sum to the table size."""
    from neural_locality_sensitive_hashing_spark.planted import N_CRAWL_BASE
    from neural_locality_sensitive_hashing_spark.queries import q_crawl_host_stats

    rows = {r.host: r for r in q_crawl_host_stats(spark, SF_DIR).collect()}
    assert len(rows) == 8
    assert sum(r.n_crawls for r in rows.values()) == 4 * N_CRAWL_BASE + 2
    assert rows[""].n_crawls == 2 and rows[""].n_pages == 1
    for h, r in rows.items():
        if h:
            assert h.startswith("example") and h.endswith(".com")
            # each base doc contributes 4 crawls -> 2 canonical pages
            assert r.n_crawls % 4 == 0 and r.n_pages == r.n_crawls // 2
