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


def _write_once(sql: str, dest: str) -> None:
    import duckdb

    if os.path.exists(dest):
        return
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".tmp"
    duckdb.sql(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
    os.replace(tmp, dest)


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
    # prune fixtures keyed to superseded fingerprints of THIS sf basename
    # (each corpus regeneration would otherwise strand a dead parquet dir
    # under .planted/ forever)
    base = os.path.basename(os.path.normpath(sf_dir))
    cur = os.path.basename(planted_dir(sf_dir))
    if os.path.isdir(PLANTED_ROOT):
        for d in os.listdir(PLANTED_ROOT):
            if d.startswith(f"{base}-") and d != cur:
                shutil.rmtree(os.path.join(PLANTED_ROOT, d), ignore_errors=True)
    return docs_dest, emb_dest
