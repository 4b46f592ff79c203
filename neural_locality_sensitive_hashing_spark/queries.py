"""Named queries for the driver contract (__spark_entry__.py).

Each entry pairs a Spark DataFrame implementation with (where the semantics
are SQL-expressible) an equivalent DuckDB oracle SQL string over the same
parquet tables. Column names and rounding are kept identical on both sides
because the driver hash-compares values after sorting columns by name.

Tokenization contract shared by Spark and SQL oracles:
    tokens  = non-empty splits of whitespace-normalized text
    shingle = 5 consecutive tokens joined by ' '  (docs shorter than 5
              tokens contribute the whole text as a single shingle)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.functions import text as T
from neural_locality_sensitive_hashing_spark.operators import similarity as S
from neural_locality_sensitive_hashing_spark.operators.connected_components import (
    clusters_with_singletons,
    connected_components,
)
from neural_locality_sensitive_hashing_spark.operators.dedup import (
    minhash_dup_pairs,
    simhash_dup_pairs,
)

CFG = DedupConfig()
NGRAM_TAU = 0.5  # exact n-gram Jaccard threshold for the pairs query


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- shared SQL fragments (DuckDB) -----------------------------------------

_SQL_TOKS = (
    "list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), "
    "x -> x <> '')"
)

_SQL_SHINGLES = f"""
toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5
              THEN list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)])
              ELSE [array_to_string(t, ' ')]
         END AS s
  FROM toks
)
"""

_SQL_EXACT_PAIRS_BODY = f"""
{_SQL_SHINGLES},
cand AS (
  SELECT DISTINCT la.doc_id AS a, lb.doc_id AS b
  FROM (SELECT doc_id, unnest(s) AS g FROM sh) la
  JOIN (SELECT doc_id, unnest(s) AS g FROM sh) lb
    ON la.g = lb.g AND la.doc_id < lb.doc_id
),
jac AS (
  SELECT c.a, c.b,
         round(len(list_intersect(sa.s, sb.s)) * 1.0
               / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
  FROM cand c JOIN sh sa ON c.a = sa.doc_id JOIN sh sb ON c.b = sb.doc_id
)
"""

_SQL_EXACT_PAIRS = "WITH " + _SQL_EXACT_PAIRS_BODY


def _spark_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", T.shingle_set(F.col("text"), CFG.shingle_k).alias("sh"))


def _spark_exact_jaccard_pairs(spark: SparkSession, sf_dir: str, tau: float) -> DataFrame:
    """Exact n-gram Jaccard pairs via shared-shingle prefilter (no crossJoin:
    only pairs with jaccard > 0 are candidates, exactly as in the oracle)."""
    sh = _spark_shingled(spark, sf_dir).persist()
    ex = sh.select("doc_id", F.explode("sh").alias("g"))
    cand = (
        ex.alias("l")
        .join(ex.alias("r"), "g")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    sa = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(inter / union, 6).alias("jaccard"))
        .where(F.col("jaccard") >= tau)
    )


# --- documents: dedup family ------------------------------------------------


def q_exact_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("text")
    return docs.select("doc_id", F.min("doc_id").over(w).alias("cluster_id"))


SQL_EXACT_DEDUP_CLUSTERS = """
SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id FROM documents
"""


def q_exact_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("fp"))
    return (
        docs.alias("l")
        .join(docs.alias("r"), "fp")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )


SQL_EXACT_DUP_PAIRS = """
SELECT l.doc_id AS a, r.doc_id AS b
FROM documents l JOIN documents r ON md5(l.text) = md5(r.text) AND l.doc_id < r.doc_id
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_exact_jaccard_pairs(spark, sf_dir, NGRAM_TAU)


SQL_NGRAM_JACCARD_PAIRS = f"""
{_SQL_EXACT_PAIRS}
SELECT a, b, jaccard FROM jac WHERE jaccard >= {NGRAM_TAU}
"""


def q_minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full LSH engine pipeline. Oracle = exact Jaccard >= τ: with 32x4
    banding the per-pair miss probability at j=0.70 is ~1.5e-4, so at test
    scale the LSH output equals the exact oracle set (verified in CI)."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dup_pairs(docs, CFG)
    return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


SQL_MINHASH_DEDUP_PAIRS = f"""
{_SQL_EXACT_PAIRS}
SELECT a, b, jaccard FROM jac WHERE jaccard >= {CFG.jaccard_threshold}
"""


def q_minhash_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dup_pairs(docs, CFG)
    labels = connected_components(pairs, CFG.max_cc_iterations)
    return clusters_with_singletons(labels, docs)


SQL_MINHASH_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_EXACT_PAIRS_BODY},
dup AS (SELECT a, b FROM jac WHERE jaccard >= {CFG.jaccard_threshold}),
edges AS (SELECT a AS src, b AS dst FROM dup UNION SELECT b, a FROM dup),
reach AS (
  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
"""


def q_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-ball pairs — not SQL-expressible (xxhash64 kernel);
    driver records the weaker rows-only check."""
    docs = load(spark, sf_dir, "documents")
    return simhash_dup_pairs(docs, CFG).select("a", "b", "hamming")


LONG_REPEAT_GRAM = 12


def q_long_repeat_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-verbatim-block pairs: docs sharing >=1 distinct
    12-token gram, with the shared-gram count. (The engine-scale winnowed
    variant is `longrepeat_winnowed_pairs`.)"""
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.shingles(T.tokens(F.col("text")), LONG_REPEAT_GRAM))
        ).alias("g"),
    ).where(F.size(T.tokens(F.col("g"))) >= F.lit(LONG_REPEAT_GRAM))
    return (
        grams.alias("l")
        .join(grams.alias("r"), "g")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count("*").alias("n_shared"))
    )


SQL_LONG_REPEAT_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(t[i:i+{LONG_REPEAT_GRAM - 1}], ' ')
     for i in range(1, len(t) - {LONG_REPEAT_GRAM - 2})])) AS g
  FROM toks WHERE len(t) >= {LONG_REPEAT_GRAM}
)
SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_shared
FROM grams l JOIN grams r ON l.g = r.g AND l.doc_id < r.doc_id
GROUP BY a, b
"""


def q_longrepeat_winnowed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-scale winnowed long-repeat pass — numpy fingerprint kernel is
    not SQL-expressible; rows-only driver check (pytest gates recall)."""
    from neural_locality_sensitive_hashing_spark.operators.suffix import (
        long_repeat_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    cfg_small = DedupConfig(long_repeat_min_tokens=LONG_REPEAT_GRAM)
    return long_repeat_pairs(docs, cfg_small, winnow_window=4)


def q_learned_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-partitioner ANN (trainer on driver sample + broadcast kernel)
    — rows-only driver check; recall gated in tests/test_learned.py."""
    from neural_locality_sensitive_hashing_spark.operators.learned import (
        fit_partitioner_on_sample,
        learned_ann,
    )

    emb = load(spark, sf_dir, "embeddings")
    weights = fit_partitioner_on_sample(emb, n_bits=10, seed=42)
    queries = emb.where(F.col("vec_id") < 32)
    return learned_ann(queries, emb, weights, k=10, n_probes=8)


# --- documents: text analysis ------------------------------------------------


def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.quality_score(F.col("text")).alias("quality"),
        T.lang_id(F.col("text")).alias("lang_guess"),
        F.md5("text").alias("fp_md5"),
    )


def _sql_lang_scores() -> str:
    from neural_locality_sensitive_hashing_spark.functions.text import _LANG_MARKERS

    parts = []
    for lang, words in _LANG_MARKERS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        parts.append(
            f"len(list_intersect(list_distinct(list_transform(t, x -> lower(x))), {arr})) AS s_{lang}"
        )
    return ", ".join(parts)


SQL_DOC_PROFILE = f"""
WITH toks AS (
  SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents
),
scored AS (
  SELECT doc_id, text, len(t) AS n_tokens, {_sql_lang_scores()}
  FROM toks
),
best AS (
  SELECT *, greatest(s_en, s_de, s_fr, s_es) AS s_best FROM scored
)
SELECT doc_id, n_tokens,
  round((
    (CASE WHEN n_tokens > 0 AND (length(text)*1.0/n_tokens) BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END)
    + (CASE WHEN length(text) > 0
            THEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))*1.0/length(text)
            ELSE 0 END)
    + (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1 ELSE 0 END)
  ) / 3.0, 6) AS quality,
  CASE WHEN s_best > 0 AND s_en = s_best THEN 'en'
       WHEN s_best > 0 AND s_de = s_best THEN 'de'
       WHEN s_best > 0 AND s_fr = s_best THEN 'fr'
       WHEN s_best > 0 AND s_es = s_best THEN 'es'
       ELSE 'und' END AS lang_guess,
  md5(text) AS fp_md5
FROM best
"""


def q_lang_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.token_count(F.col("text")).alias("n"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n"), 4).alias("avg_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


SQL_LANG_SUMMARY = f"""
WITH toks AS (SELECT lang, len({_SQL_TOKS}) AS n FROM documents)
SELECT lang, count(*) AS n_docs, round(avg(n), 4) AS avg_tokens, max(n) AS max_tokens
FROM toks GROUP BY lang
"""


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(100)
    )


SQL_TOP_TOKENS = f"""
WITH toks AS (SELECT unnest({_SQL_TOKS}) AS token FROM documents)
SELECT token, count(*) AS cnt FROM toks GROUP BY token
ORDER BY cnt DESC, token ASC LIMIT 100
"""


# --- embeddings: similarity search -------------------------------------------


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 32)
    return S.knn_bruteforce(queries, emb, k=10)


SQL_KNN_BRUTEFORCE = """
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 32),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sim AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
           AS cosine
  FROM q, c WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
           AS rank
  FROM sim
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
"""


def q_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate neighbors — rows-only driver check; the
    recall-vs-bruteforce gate lives in tests/test_similarity.py."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 32)
    dim = len(emb.select("embedding").first()[0])
    return S.ann_lsh(queries, emb, dim=dim, k=10)


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(S.l2_norm(v), 6).alias("l2_norm"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 6).alias(
            "mean_val"
        ),
    )


SQL_EMBEDDING_STATS = """
SELECT vec_id, len(embedding) AS dim,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
       round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS mean_val
FROM embeddings
"""


def q_embedding_l2_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (reference nlsh/data.py:9-10,35-37): project vectors onto the unit
    sphere; exploded to (vec_id, dim_idx, val) for value comparison."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = S.l2_norm(v)
    return emb.select(
        "vec_id", F.posexplode(v).alias("dim_idx", "raw")
    ).join(
        emb.select("vec_id", norm.alias("n")), "vec_id"
    ).select(
        "vec_id", "dim_idx", F.round(F.col("raw") / F.col("n"), 6).alias("val")
    )


SQL_EMBEDDING_L2_NORMALIZED = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM embeddings
)
SELECT vec_id, t.i - 1 AS dim_idx, round(v[t.i] / n, 6) AS val
FROM e CROSS JOIN (SELECT generate_series AS i FROM generate_series(1, 64)) t
WHERE t.i <= len(v)
"""


def q_embedding_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (reference nlsh/data.py:29-33): per-dimension z-score with
    corpus moments — (x - mean_dim) / std_dim, sample stddev."""
    emb = load(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim_idx", "raw")
    ).select("vec_id", "dim_idx", F.col("raw").cast("double").alias("raw"))
    w = Window.partitionBy("dim_idx")
    return vals.select(
        "vec_id",
        "dim_idx",
        F.round(
            (F.col("raw") - F.mean("raw").over(w)) / F.stddev_samp("raw").over(w), 6
        ).alias("val"),
    )


SQL_EMBEDDING_ZSCORE = """
WITH vals AS (
  SELECT vec_id, t.i - 1 AS dim_idx, embedding[t.i]::DOUBLE AS raw
  FROM embeddings CROSS JOIN (SELECT generate_series AS i FROM generate_series(1, 64)) t
  WHERE t.i <= len(embedding)
)
SELECT vec_id, dim_idx,
       round((raw - avg(raw) OVER (PARTITION BY dim_idx))
             / stddev_samp(raw) OVER (PARTITION BY dim_idx), 6) AS val
FROM vals
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim_idx", "val"))
        .groupBy("label", "dim_idx")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid"))
    )


SQL_LABEL_CENTROIDS = """
SELECT label, t.i - 1 AS dim_idx, round(avg(embedding[t.i]::DOUBLE), 6) AS centroid
FROM embeddings CROSS JOIN (SELECT generate_series AS i FROM generate_series(1, 64)) t
WHERE t.i <= len(embedding)
GROUP BY label, dim_idx
"""


EMB_DUP_TAU = 0.4  # synthetic embeddings are diffuse (max pairwise ~0.51)


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: broadcast-matmul all-pairs.

    The small side (here: the whole table — it is a small dim table at test
    scale) is collected, L2-normalized, and broadcast as a numpy matrix;
    each partition then does ONE (batch x dim) @ (dim x N) matmul per Arrow
    batch instead of a crossJoin with interpreted per-element array
    expressions (measured 31s -> ~2s at sf0.1). The LSH-bucketed variants
    (`ann_lsh_cosine`, `learned_ann_cosine`) are the 100 TB path where no
    side fits in a broadcast."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()  # small broadcast side
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    m = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    b_ids = spark.sparkContext.broadcast(ids)
    b_m = spark.sparkContext.broadcast(m)

    def gen(batches):
        cids = b_ids.value
        cm = b_m.value
        for pdf in batches:
            x = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            sims = np.round(x @ cm.T, 6)
            out_a, out_b, out_c = [], [], []
            for i, vid in enumerate(pdf["vec_id"]):
                mask = (sims[i] >= EMB_DUP_TAU) & (cids > vid)
                for j in np.nonzero(mask)[0]:
                    out_a.append(vid)
                    out_b.append(int(cids[j]))
                    out_c.append(float(sims[i, j]))
            yield pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    return emb.select("vec_id", "embedding").mapInPandas(
        gen, "a long, b long, cosine double"
    )


SQL_EMBEDDING_DUP_PAIRS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT l.vec_id AS a, r.vec_id AS b,
       round(list_dot_product(l.v, r.v)
             / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v))), 6)
         AS cosine
FROM e l JOIN e r ON l.vec_id < r.vec_id
WHERE round(list_dot_product(l.v, r.v)
            / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v))), 6)
      >= {EMB_DUP_TAU}
"""

# GPT2-style pretokenizer shape: word pieces OR single non-space symbols
BPE_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish token counts per doc (training-data costing)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), F.lit(0))
        ).alias("bpe_tokens"),
    )


SQL_TOKEN_STATS = f"""
SELECT doc_id,
       len(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                       x -> x <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_REGEX}')) AS bpe_tokens
FROM documents
"""


# --- relational parity (TPC-H-ish) -------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def q_event_type_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour_ts")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


SQL_EVENT_TYPE_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS hour_ts,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_user_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-3 events by value (the reference's per-query top-k
    ranking window, SURVEY §2.5 A5)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= 3)
    )


SQL_USER_TOPK_EVENTS = """
SELECT user_id, event_id, value, rank FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
  FROM events
) WHERE rank <= 3
"""


# --- registry -----------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "exact_dedup_clusters": q_exact_dedup_clusters,
    "exact_dup_pairs": q_exact_dup_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_dedup_pairs": q_minhash_dedup_pairs,
    "minhash_dedup_clusters": q_minhash_dedup_clusters,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "long_repeat_pairs": q_long_repeat_pairs,
    "longrepeat_winnowed_pairs": q_longrepeat_winnowed_pairs,
    "learned_ann_cosine": q_learned_ann_cosine,
    "doc_profile": q_doc_profile,
    "lang_summary": q_lang_summary,
    "top_tokens": q_top_tokens,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "token_stats": q_token_stats,
    "knn_bruteforce": q_knn_bruteforce,
    "ann_lsh_cosine": q_ann_lsh_cosine,
    "embedding_stats": q_embedding_stats,
    "label_centroids": q_label_centroids,
    "embedding_l2_normalized": q_embedding_l2_normalized,
    "embedding_zscore": q_embedding_zscore,
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "event_type_hourly": q_event_type_hourly,
    "user_topk_events": q_user_topk_events,
}

ORACLES: dict[str, str] = {
    "exact_dedup_clusters": SQL_EXACT_DEDUP_CLUSTERS,
    "exact_dup_pairs": SQL_EXACT_DUP_PAIRS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "minhash_dedup_pairs": SQL_MINHASH_DEDUP_PAIRS,
    "minhash_dedup_clusters": SQL_MINHASH_DEDUP_CLUSTERS,
    "long_repeat_pairs": SQL_LONG_REPEAT_PAIRS,
    # simhash_dup_pairs, longrepeat_winnowed_pairs, ann_lsh_cosine,
    # learned_ann_cosine: non-SQL-expressible → rows-only
    "doc_profile": SQL_DOC_PROFILE,
    "lang_summary": SQL_LANG_SUMMARY,
    "top_tokens": SQL_TOP_TOKENS,
    "embedding_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
    "token_stats": SQL_TOKEN_STATS,
    "knn_bruteforce": SQL_KNN_BRUTEFORCE,
    "embedding_stats": SQL_EMBEDDING_STATS,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "embedding_l2_normalized": SQL_EMBEDDING_L2_NORMALIZED,
    "embedding_zscore": SQL_EMBEDDING_ZSCORE,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_customers": SQL_TOP_CUSTOMERS,
    "event_type_hourly": SQL_EVENT_TYPE_HOURLY,
    "user_topk_events": SQL_USER_TOPK_EVENTS,
}
