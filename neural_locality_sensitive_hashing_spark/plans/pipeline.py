"""The resumable dedup pipeline (SURVEY.md §7 stages 1+3+4).

Stages (each one an idempotent checkpoint table):

    signatures   : pages -> (doc_id, sh, sig, simhash)
    cand_pairs   : band-explode + bucket self-join (+ SimHash chunks)
    dup_pairs    : exact-Jaccard verified pairs (+ SimHash Hamming pairs
                   + suffix long-repeat pairs when enabled); with
                   cfg.verify_screen the two-tier MinHash-prefix screen
                   verifies instead (clear accepts report est-Jaccard,
                   only the uncertainty band gathers full shingle sets)
    clusters     : union-find fixpoint over dup_pairs, singletons included
    keep_list    : the SHIPPED table — one representative per cluster
                   (doc_id == cluster_id) + docs-represented count;
                   derived from the clusters checkpoint, so a resume
                   after a dropped keep_list restores from clusters
                   without recomputing pairs or the union-find

Resume semantics (the reference's cache-the-expensive-intermediate pattern,
``precompute.py:89-97``, generalized): each stage's fingerprint is a hash of
(engine version, config, input token, upstream fingerprint). A rerun reuses
every stage whose fingerprint matches and recomputes from the first miss —
so a job killed after `cand_pairs` resumes at `dup_pairs`, and a config
change (e.g. new threshold) invalidates exactly the stages downstream of
the change.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.functions.simhash import simhash_udf
from neural_locality_sensitive_hashing_spark.operators.candidates import (
    bucket_stats,
    candidate_pairs,
    explode_bands,
)
from neural_locality_sensitive_hashing_spark.operators.connected_components import (
    clusters_with_singletons,
    connected_components,
)
from neural_locality_sensitive_hashing_spark.functions.minhash import make_sig_prefix_udf
from neural_locality_sensitive_hashing_spark.operators.dedup import signatures_fused
from neural_locality_sensitive_hashing_spark.operators.verify import (
    jaccard_verify,
    jaccard_verify_screened,
)
from neural_locality_sensitive_hashing_spark.sources.checkpoint import CheckpointCatalog


@dataclass
class StageReport:
    stage: str
    cached: bool
    rows: int
    wall_sec: float


@dataclass
class PipelineReport:
    stages: list[StageReport] = field(default_factory=list)

    def cached_stages(self) -> set[str]:
        return {s.stage for s in self.stages if s.cached}


class DedupPipeline:
    """Checkpointed pages -> clusters pipeline."""

    STAGES = ["signatures", "cand_pairs", "dup_pairs", "clusters", "keep_list"]

    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig,
        checkpoint_dir: str,
        input_token: str,
    ):
        self.spark = spark
        self.cfg = cfg
        self.catalog = CheckpointCatalog(spark, checkpoint_dir)
        self.input_token = input_token
        self._fps = self._fingerprints()

    def _fingerprints(self) -> dict[str, str]:
        cfg_d = asdict(self.cfg)
        fps: dict[str, str] = {}
        upstream = hashlib.sha256(
            json.dumps({"input": self.input_token, "cfg": cfg_d}, sort_keys=True).encode()
        ).hexdigest()
        for stage in self.STAGES:
            upstream = hashlib.sha256(f"{upstream}/{stage}/v1".encode()).hexdigest()
            fps[stage] = upstream[:24]
        return fps

    def _stage(self, name: str, compute, report: PipelineReport) -> DataFrame:
        t0 = time.time()
        fp = self._fps[name]
        if self.catalog.has_snapshot(name, fp):
            df = self.catalog.read_snapshot(name)
            report.stages.append(StageReport(name, True, -1, round(time.time() - t0, 3)))
            return df
        df = self.catalog.write_snapshot(compute(), name, fp)
        report.stages.append(
            StageReport(name, False, df.count(), round(time.time() - t0, 3))
        )
        return df

    def run(self, pages: DataFrame) -> tuple[DataFrame, PipelineReport]:
        report = PipelineReport()
        cfg = self.cfg

        def compute_signatures() -> DataFrame:
            sigs = signatures_fused(pages, cfg)
            if cfg.shingle_hash_bytes == 8:
                # the SimHash contract is defined over 64-bit shingle
                # hashes; with the 4-byte scale gather the column is
                # meaningless (and the kernel would reject the buffer)
                sigs = sigs.withColumn("simhash", simhash_udf(F.col("sh")))
            if cfg.verify_screen:
                # the screen's uint32 estimator prefix, derived from the
                # full signature so the stage stays one Arrow pass; lands
                # in the checkpoint (config is part of the fingerprint, so
                # toggling the screen invalidates downstream stages)
                sigs = sigs.withColumn(
                    "sigp", make_sig_prefix_udf(cfg.screen_perms)(F.col("sig"))
                )
            return sigs

        signatures = self._stage("signatures", compute_signatures, report)

        def compute_cands() -> DataFrame:
            bands = explode_bands(signatures, cfg)
            return candidate_pairs(bands, cfg)

        cands = self._stage("cand_pairs", compute_cands, report)

        def compute_dups() -> DataFrame:
            if cfg.verify_screen:
                return jaccard_verify_screened(
                    cands, signatures.select("doc_id", "sh", "sigp"), cfg
                )
            return jaccard_verify(cands, signatures.select("doc_id", "sh"), cfg)

        dups = self._stage("dup_pairs", compute_dups, report)

        def compute_clusters() -> DataFrame:
            labels = connected_components(dups, cfg.max_cc_iterations)
            return clusters_with_singletons(labels, signatures, "doc_id")

        clusters = self._stage("clusters", compute_clusters, report)

        def compute_keep_list() -> DataFrame:
            # one size aggregate over the CLUSTERS CHECKPOINT — survivors
            # are the doc_id == cluster_id rows (the union-find labels
            # clusters by min doc_id), no shuffle of pairs or corpus
            sizes = clusters.groupBy("cluster_id").agg(
                F.count("*").alias("n_docs_represented")
            )
            return (
                clusters.where(F.col("doc_id") == F.col("cluster_id"))
                .join(sizes, "cluster_id")
                .select("doc_id", "n_docs_represented")
            )

        self._stage("keep_list", compute_keep_list, report)

        # S8 metrics sink: one quality/efficiency row set per run, next to
        # the per-partition lineage (the reference logs recall/query_size/
        # bucket stats every eval — nlsh/trainers/base.py:87-108).
        # A fully-cached resume recomputes nothing, so it also re-logs
        # nothing: the run_id (clusters fingerprint) already has its rows.
        if all(s.cached for s in report.stages):
            return clusters, report
        agg = dups.agg(
            F.count("*").alias("n_pairs"), F.avg("jaccard").alias("avg_j")
        ).first()
        n_docs = signatures.count()
        n_clusters = clusters.select("cluster_id").distinct().count()
        metrics = {
            "n_docs": float(n_docs),
            "dup_pairs": float(agg["n_pairs"]),
            "avg_jaccard": float(agg["avg_j"] or 0.0),
            "n_clusters": float(n_clusters),
            "candidate_pairs": float(cands.count()),
            "wall_sec": round(sum(s.wall_sec for s in report.stages), 3),
        }
        # per-band candidate fan-out (bucket_stats pair_mass): makes skew
        # drift auditable across runs — a band whose pair_mass balloons is
        # the one a boilerplate template landed in
        for row in bucket_stats(explode_bands(signatures, cfg)).collect():
            band = int(row["band"])
            metrics[f"band_{band:02d}_pair_mass"] = float(row["pair_mass"])
            metrics[f"band_{band:02d}_max_bucket"] = float(row["max_bucket"])
        self.catalog.write_metrics(metrics, run_id=self._fps["clusters"])
        return clusters, report

    # -- resume helpers -------------------------------------------------------

    def drop_from(self, stage: str) -> None:
        """Simulate a mid-pipeline kill: drop this stage and everything after."""
        idx = self.STAGES.index(stage)
        for s in self.STAGES[idx:]:
            self.catalog.drop_snapshot(s)
