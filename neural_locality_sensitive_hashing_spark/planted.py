"""Planted duplicate fixtures as a DATA-LAYER table (not query-body unions).

The driver corpus has no exact duplicates and no cosine>=0.8 embedding
pairs, so the `exact_dup_pairs` / `embedding_dup_pairs_hi` oracles would be
vacuously green (0 rows vs 0 rows). Earlier rounds unioned synthetic rows
inside the query bodies, which meant a user calling "exact_dup_pairs" got
rows that were not in any table. This module moves the fixtures into the
data layer: deterministic planted tables DERIVED from the driver corpus
(copies of the lowest ids under +10_000_000 offsets; embedding copies with
element 0 shifted +0.05 → cosine ≈ 0.9988 to their source), written ONCE
per scale factor as real parquet next to the repo (the driver's testdata
directory is read-only) and read as ordinary tables by BOTH the Spark
query and the DuckDB oracle SQL — so the comparison checks real values
flowing through the full pipeline, and the query answers its own name over
tables only.

Generation is duckdb-based (no SparkSession needed — the oracle side must
be able to trigger it too) and idempotent: write to a temp file, atomic
rename, skip when present.
"""

from __future__ import annotations

import hashlib
import os
import shutil

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANTED_ROOT = os.path.join(_REPO, ".planted")

N_PLANTED_DOCS = 5  # copies of the 5 lowest doc_ids
N_PLANTED_VECS = 4  # near-copies of the 4 lowest vec_ids
VEC_SHIFT = 0.05  # element-0 shift: cosine ≈ 0.9988 on the driver embeddings
N_CRAWL_BASE = 30  # base docs fanned out into recrawl URL variants
N_PII_DOCS = 25  # base docs suffixed with synthetic emails/IPv4s


def _source_fingerprint(sf_dir: str) -> str:
    """Cache key component derived from the SOURCE tables' identity:
    absolute path + size + mtime of both parquet files. A regenerated
    corpus (or a same-basename sf dir under a different root) gets a new
    planted directory instead of silently serving stale fixtures — stale
    fixtures would stop matching any corpus row, and since BOTH engines
    read the planted file the oracle would go vacuously green (0 vs 0),
    the exact failure mode this module exists to prevent."""
    h = hashlib.sha256()
    for name in ("documents.parquet", "embeddings.parquet"):
        p = os.path.join(sf_dir, name)
        st = os.stat(p)
        h.update(f"{os.path.abspath(p)}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:12]


def planted_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        PLANTED_ROOT, f"{base}-{_source_fingerprint(sf_dir)}"
    )


def planted_documents_path(sf_dir: str) -> str:
    return os.path.join(planted_dir(sf_dir), "planted_documents.parquet")


def planted_embeddings_path(sf_dir: str) -> str:
    return os.path.join(planted_dir(sf_dir), "planted_embeddings.parquet")


def planted_crawls_path(sf_dir: str) -> str:
    return os.path.join(planted_dir(sf_dir), "planted_crawls.parquet")


def planted_pii_path(sf_dir: str) -> str:
    return os.path.join(planted_dir(sf_dir), "planted_pii.parquet")


def _write_once(sql: str, dest: str) -> None:
    import duckdb

    if os.path.exists(dest):
        return
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    # pid-suffixed tmp: two concurrent processes (bench + verify both
    # triggering oracle generation) would otherwise write/replace the SAME
    # tmp path — content-identical, but one COPY can fail if the other's
    # os.replace removes the file under it mid-write.
    tmp = f"{dest}.{os.getpid()}.tmp"
    try:
        duckdb.sql(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def ensure_planted(sf_dir: str) -> tuple[str, str]:
    """Idempotently materialize both planted tables for ``sf_dir``; returns
    (documents_path, embeddings_path). The derivations are exactly the
    fixtures previous rounds computed inline, so planted values (and the
    green oracle results) are unchanged — they just live in parquet now."""
    docs_src = os.path.join(sf_dir, "documents.parquet")
    emb_src = os.path.join(sf_dir, "embeddings.parquet")
    # distinguish "environment has no data" (FileNotFoundError — callers
    # may degrade to a rows-only oracle) from a REAL generation bug
    # (anything else — must propagate loudly, never silently drop the
    # anti-vacuity oracle)
    for src in (docs_src, emb_src):
        if not os.path.exists(src):
            raise FileNotFoundError(src)
    docs_dest = planted_documents_path(sf_dir)
    emb_dest = planted_embeddings_path(sf_dir)
    _write_once(
        f"""
        SELECT doc_id + 10000000 AS doc_id, text
        FROM read_parquet('{docs_src}')
        WHERE doc_id < {N_PLANTED_DOCS}
        """,
        docs_dest,
    )
    _write_once(
        f"""
        SELECT vec_id + 10000000 AS vec_id,
               list_prepend(CAST(embedding[1] + {VEC_SHIFT} AS FLOAT),
                            embedding[2:]) AS embedding,
               label
        FROM read_parquet('{emb_src}')
        WHERE vec_id < {N_PLANTED_VECS}
        """,
        emb_dest,
    )
    _mark_and_prune(sf_dir)
    return docs_dest, emb_dest


def ensure_planted_pii(sf_dir: str) -> str:
    """Idempotently materialize the planted PII table: N_PII_DOCS corpus
    docs (ids offset +20_000_000) whose text is suffixed with one
    deterministic synthetic email and one private-range IPv4 — the
    synthetic driver corpus contains neither, which would make a PII
    scrubbing oracle vacuous (every count 0, every redaction the
    identity). Two of the rows carry a SECOND email so per-doc counts
    exercise >1."""
    docs_src = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(docs_src):
        raise FileNotFoundError(docs_src)
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        raise FileNotFoundError(os.path.join(sf_dir, "embeddings.parquet"))
    dest = planted_pii_path(sf_dir)
    _write_once(
        f"""
        SELECT doc_id + 20000000 AS doc_id,
               text || ' contact user' || doc_id || '@mail'
                    || (doc_id % 3) || '.org'
                    || CASE WHEN doc_id < 2
                            THEN ' cc admin' || doc_id || '@ops.example.net'
                            ELSE '' END
                    || ' from 10.0.' || (doc_id % 200) || '.'
                    || (doc_id % 250) AS text
        FROM read_parquet('{docs_src}')
        WHERE doc_id < {N_PII_DOCS}
        """,
        dest,
    )
    _mark_and_prune(sf_dir)
    return dest


def _mark_and_prune(sf_dir: str) -> None:
    """Record which SOURCE directory this fixture dir derives from, then
    prune only superseded fingerprints of THE SAME source (marker file
    matches this sf_dir's abspath). Pruning on basename alone would let
    two live same-basename corpora under different roots delete each
    other's fixtures — regeneration thrash, or a loud mid-run read
    failure for a process holding oracle SQL that embeds the old path."""
    src_abs = os.path.abspath(sf_dir)
    marker = os.path.join(planted_dir(sf_dir), "SOURCE")
    if not os.path.exists(marker):
        with open(marker + f".{os.getpid()}.tmp", "w") as fh:
            fh.write(src_abs)
        os.replace(marker + f".{os.getpid()}.tmp", marker)
    base = os.path.basename(os.path.normpath(sf_dir))
    cur = os.path.basename(planted_dir(sf_dir))
    if os.path.isdir(PLANTED_ROOT):
        for d in os.listdir(PLANTED_ROOT):
            if not d.startswith(f"{base}-") or d == cur:
                continue
            other_marker = os.path.join(PLANTED_ROOT, d, "SOURCE")
            try:
                with open(other_marker) as fh:
                    other_src = fh.read().strip()
            except OSError:
                continue  # unknown provenance (pre-marker dir): never delete
            if other_src == src_abs:
                shutil.rmtree(os.path.join(PLANTED_ROOT, d), ignore_errors=True)


def ensure_planted_crawls(sf_dir: str) -> str:
    """Idempotently materialize the planted RECRAWL table for ``sf_dir``
    and return its path — the input the recrawl dedup tier needs
    (url, warc_ts, html, text, lang per BASELINE input_hint, plus a
    crawl_id for deterministic tie-breaks) that the driver corpus lacks
    (its documents table has no url/warc_ts columns, and every synthetic
    URL would be unique — the recrawl oracle would be vacuous).

    Derivation (deterministic, from the corpus): for each of the
    N_CRAWL_BASE lowest doc_ids, four crawls of the same page —
      k=0  https://www.Example{d%7}.com/path/{d}?b=2&a=1&ref
      k=1  https://WWW.example{d%7}.com:443/path/{d}/?a=1&b=2&utm_source=feed
      k=2  https://example{d%7}.com/path/{d}?a=1&UTM_Campaign=x&b=2#sec
      k=3  https://example{d%7}.com/only/{d}          (singleton control)
    k=0..2 differ ONLY by www/case/default-port/trailing-slash/fragment/
    param-order/tracking-param noise, so they share one canonical URL
    (winner: k=2, the newest warc_ts); k=3 stays its own key. Two extra
    rows share a SCHEMELESS url ('no-scheme...') to pin the
    raw-string fallback path (try_parse_url → NULL → raw url as the key).
    warc_ts = 2024-01-01 + d days + k hours (unique, ordered by k)."""
    docs_src = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(docs_src):
        raise FileNotFoundError(docs_src)
    # planted_dir's fingerprint stats embeddings.parquet too
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        raise FileNotFoundError(os.path.join(sf_dir, "embeddings.parquet"))
    dest = planted_crawls_path(sf_dir)
    host = "'example' || (d % 7) || '.com'"
    base_url = f"'/path/' || d"
    _write_once(
        f"""
        WITH base AS (
          SELECT doc_id AS d, text, lang FROM read_parquet('{docs_src}')
          WHERE doc_id < {N_CRAWL_BASE}
        ),
        v AS (SELECT unnest(range(4)) AS k),
        crawls AS (
          SELECT d * 10 + k AS crawl_id,
            CASE k
              WHEN 0 THEN 'https://www.Example' || (d % 7) || '.com'
                          || {base_url} || '?b=2&a=1&ref'
              WHEN 1 THEN 'https://WWW.' || {host} || ':443'
                          || {base_url} || '/?a=1&b=2&utm_source=feed'
              WHEN 2 THEN 'https://' || {host}
                          || {base_url} || '?a=1&UTM_Campaign=x&b=2#sec'
              ELSE 'https://' || {host} || '/only/' || d
            END AS url,
            TIMESTAMP '2024-01-01 00:00:00'
              + d * INTERVAL 1 DAY + k * INTERVAL 1 HOUR AS warc_ts,
            encode(text) AS html, text, lang
          FROM base CROSS JOIN v
        )
        SELECT * FROM crawls
        UNION ALL
        SELECT 9000001, 'no-scheme.example.com/page?x=1',
               TIMESTAMP '2024-02-01 00:00:00', encode('raw-a'), 'raw-a', 'en'
        UNION ALL
        SELECT 9000002, 'no-scheme.example.com/page?x=1',
               TIMESTAMP '2024-02-02 00:00:00', encode('raw-b'), 'raw-b', 'en'
        """,
        dest,
    )
    _mark_and_prune(sf_dir)
    return dest
