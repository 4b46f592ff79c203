"""Checkpoint/resume tests (FIXTURES §4: resume scenario + lineage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline

CFG = DedupConfig()


@pytest.fixture(scope="module")
def pipeline_env(spark, pages_1k, tmp_path_factory):
    pages_path, _ = pages_1k
    pages = spark.read.parquet(pages_path)
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    return pages, ckpt


def _cluster_map(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def test_full_run_then_resume_is_identical_and_skips_stages(spark, pipeline_env):
    pages, ckpt = pipeline_env
    pipe = DedupPipeline(spark, CFG, ckpt, input_token="pages_1k")
    clusters1, rep1 = pipe.run(pages)
    m1 = _cluster_map(clusters1)
    assert rep1.cached_stages() == set()

    # rerun without dropping anything: everything cached
    clusters2, rep2 = pipe.run(pages)
    assert rep2.cached_stages() == set(DedupPipeline.STAGES)
    assert _cluster_map(clusters2) == m1

    # kill after cand_pairs: drop dup_pairs + clusters, resume
    pipe.drop_from("dup_pairs")
    clusters3, rep3 = pipe.run(pages)
    assert rep3.cached_stages() == {"signatures", "cand_pairs"}
    assert _cluster_map(clusters3) == m1


def test_config_change_invalidates(spark, pipeline_env):
    pages, ckpt = pipeline_env
    cfg2 = DedupConfig(jaccard_threshold=0.8)
    pipe = DedupPipeline(spark, cfg2, ckpt, input_token="pages_1k")
    clusters, rep = pipe.run(pages)
    # different fingerprint -> nothing reused from the τ=0.7 run
    assert rep.cached_stages() == set()
    assert clusters.count() == pages.count()


def test_lineage_written(spark, pipeline_env):
    pages, ckpt = pipeline_env
    pipe = DedupPipeline(spark, CFG, ckpt, input_token="pages_1k")
    pipe.run(pages)
    lineage = pipe.catalog.lineage()
    assert lineage is not None
    stages = {r.stage for r in lineage.select("stage").distinct().collect()}
    assert set(DedupPipeline.STAGES) <= stages
    # per-partition rows sum to stage totals for the latest clusters snapshot
    total = (
        lineage.where(F.col("stage") == "clusters")
        .groupBy("fingerprint")
        .agg(F.sum("rows").alias("n"))
        .collect()
    )
    assert any(r.n == pages.count() for r in total)


def test_screened_pipeline_runs_and_resumes_bit_identical(spark, pages_1k, tmp_path_factory):
    """cfg.verify_screen threads the two-tier verify through the pipeline:
    same dup-pair SET and clusters as the exact path on this corpus (dups
    sit far from the tau margin), checkpoint/resume still bit-identical."""
    pages_path, _ = pages_1k
    pages = spark.read.parquet(pages_path)
    ckpt = str(tmp_path_factory.mktemp("ckpt_screen"))

    cfg_s = DedupConfig(verify_screen=True)
    pipe = DedupPipeline(spark, cfg_s, ckpt, input_token="pages_1k")
    clusters1, rep1 = pipe.run(pages)
    m1 = _cluster_map(clusters1)
    assert rep1.cached_stages() == set()
    pairs1 = sorted(
        (r.a, r.b, r.jaccard)
        for r in pipe.catalog.read_snapshot("dup_pairs").collect()
    )
    assert pairs1  # the screen actually verified pairs

    # kill after cand_pairs; resume reuses upstream, re-verifies, and the
    # recomputed dup_pairs + clusters are bit-identical
    pipe.drop_from("dup_pairs")
    clusters2, rep2 = pipe.run(pages)
    assert rep2.cached_stages() == {"signatures", "cand_pairs"}
    pairs2 = sorted(
        (r.a, r.b, r.jaccard)
        for r in pipe.catalog.read_snapshot("dup_pairs").collect()
    )
    assert pairs2 == pairs1
    assert _cluster_map(clusters2) == m1

    # pair SET and clusters agree with the exact-verify pipeline
    exact_ckpt = str(tmp_path_factory.mktemp("ckpt_exact"))
    pipe_e = DedupPipeline(spark, DedupConfig(), exact_ckpt, input_token="pages_1k")
    clusters_e, _ = pipe_e.run(pages)
    pairs_e = {
        (r.a, r.b) for r in pipe_e.catalog.read_snapshot("dup_pairs").collect()
    }
    assert {(a, b) for a, b, _ in pairs1} == pairs_e
    assert _cluster_map(clusters_e) == m1


def test_pipeline_with_4byte_shingles(spark, pages_1k, tmp_path_factory):
    """Regression: the pipeline's signatures stage must not feed 4-byte
    shingle hashes to the 64-bit SimHash kernel (crashed with 'buffer size
    must be a multiple of element size'); with shingle_hash_bytes=4 the
    simhash column is skipped and clusters match the 8-byte run."""
    pages_path, _ = pages_1k
    pages = spark.read.parquet(pages_path)
    ckpt = str(tmp_path_factory.mktemp("ckpt4"))
    cfg4 = DedupConfig(shingle_hash_bytes=4)
    pipe4 = DedupPipeline(spark, cfg4, ckpt, input_token="pages_1k")
    clusters4, _ = pipe4.run(pages)
    m4 = _cluster_map(clusters4)
    # the SIGNATURES snapshot (where the column would live) must skip it
    assert "simhash" not in pipe4.catalog.read_snapshot("signatures").columns
    ckpt8 = str(tmp_path_factory.mktemp("ckpt8"))
    clusters8, _ = DedupPipeline(spark, CFG, ckpt8, input_token="pages_1k").run(pages)
    assert m4 == _cluster_map(clusters8)


def test_keep_list_stage_resumes_from_clusters(spark, pipeline_env):
    """VERDICT r5 item 3: the keep-list is the table the pipeline ships,
    so it must be a checkpointed stage that restores from the clusters
    checkpoint — dropping ONLY keep_list and rerunning recomputes it
    byte-identical without touching pairs or the union-find."""
    pages, ckpt = pipeline_env
    pipe = DedupPipeline(spark, CFG, ckpt, input_token="pages_1k")
    pipe.run(pages)
    kl1 = sorted(tuple(r) for r in pipe.catalog.read_snapshot("keep_list").collect())
    assert kl1
    # every document is represented by exactly one survivor
    assert sum(n for _, n in kl1) == pages.count()
    # survivors are one per cluster
    clusters = pipe.catalog.read_snapshot("clusters")
    assert len(kl1) == clusters.select("cluster_id").distinct().count()

    pipe.drop_from("keep_list")
    _, rep = pipe.run(pages)
    assert rep.cached_stages() == {
        "signatures", "cand_pairs", "dup_pairs", "clusters"
    }
    kl2 = sorted(tuple(r) for r in pipe.catalog.read_snapshot("keep_list").collect())
    assert kl2 == kl1
