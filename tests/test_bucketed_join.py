"""Bucketed signature store: the verify gather join must NOT shuffle the
sets side (co-located scan), and results must equal the plain-parquet
path. The 100 TB pattern for repeatedly-probed state."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.operators.candidates import (
    candidate_pairs,
)
from neural_locality_sensitive_hashing_spark.operators.dedup import (
    banded_signatures_fused,
    explode_fused_bands,
)
from neural_locality_sensitive_hashing_spark.operators.verify import jaccard_verify
from neural_locality_sensitive_hashing_spark.sources.checkpoint import (
    CheckpointCatalog,
)

CFG = DedupConfig()


def test_bucketed_sets_side_not_shuffled(spark, pages_1k, tmp_path):
    pages_path, _ = pages_1k
    pages = spark.read.parquet(pages_path)
    sigs = banded_signatures_fused(pages, CFG).persist()
    cands = candidate_pairs(explode_fused_bands(sigs), CFG).persist()
    plain = {(r.a, r.b) for r in jaccard_verify(cands, sigs, CFG).collect()}

    cat = CheckpointCatalog(spark, str(tmp_path / "ckpt"))
    bucketed = cat.write_bucketed_table(
        sigs.select("doc_id", "sh"), "sig_store_bucketed", "doc_id", n_buckets=8
    )
    # model the large-table regime: a 10^12-row store can't broadcast, so
    # the join is sort-merge — where bucketing removes the store-side
    # shuffle AND its sort (the data is written bucketed + sorted)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        verified = jaccard_verify(cands, bucketed, CFG)
        got = {(r.a, r.b) for r in verified.collect()}
        assert got == plain and len(got) > 0

        plan = verified._jdf.queryExecution().executedPlan().toString()
        scan_lines = [
            ln for ln in plan.splitlines()
            if "sig_store_bucketed" in ln and "FileScan" in ln
        ]
        # AQE prints initial + final plans, so each of the two gather-join
        # scans can appear twice
        assert len(scan_lines) >= 2, plan
        for ln in scan_lines:
            assert "Bucketed: true" in ln, ln
        # bucketed sides arrive pre-partitioned: the only hash exchanges
        # left are the candidate machinery + the pairs side of each join
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS sig_store_bucketed")
    sigs.unpersist()
    cands.unpersist()
