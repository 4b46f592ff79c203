"""Planted-fixture data layer (planted.py): deterministic derivation,
idempotent atomic materialization, and the exact values both engines read.
No SparkSession needed — generation is duckdb-side by design so the oracle
path can trigger it too."""

from __future__ import annotations

import os

import duckdb
import numpy as np

from neural_locality_sensitive_hashing_spark import planted

SF = "/root/testdata/sf0.001"


def test_planted_documents_are_exact_copies(tmp_path, monkeypatch):
    monkeypatch.setattr(planted, "PLANTED_ROOT", str(tmp_path / "p"))
    docs_p, emb_p = planted.ensure_planted(SF)
    rows = duckdb.sql(
        f"""
        SELECT p.doc_id, p.text = d.text AS same
        FROM read_parquet('{docs_p}') p
        JOIN read_parquet('{SF}/documents.parquet') d
          ON p.doc_id = d.doc_id + 10000000
        ORDER BY p.doc_id
        """
    ).fetchall()
    assert len(rows) == planted.N_PLANTED_DOCS
    assert all(same for _, same in rows)

    # embeddings: element 0 shifted by +0.05 (float32), rest identical,
    # cosine to the source ~0.99+ (the near-dup the _hi oracle verifies)
    pairs = duckdb.sql(
        f"""
        SELECT p.embedding AS pe, e.embedding AS ee,
               CAST(e.embedding[1] + {planted.VEC_SHIFT} AS FLOAT) AS want0
        FROM read_parquet('{emb_p}') p
        JOIN read_parquet('{SF}/embeddings.parquet') e
          ON p.vec_id = e.vec_id + 10000000
        ORDER BY p.vec_id
        """
    ).fetchall()
    assert len(pairs) == planted.N_PLANTED_VECS
    for pe, ee, want0 in pairs:
        a, b = np.array(pe, dtype=np.float64), np.array(ee, dtype=np.float64)
        # element 0: bit-exact vs the derivation expression (re-evaluated
        # in duckdb here, so the contract survives engine float quirks);
        # and within one float32 ulp of the mathematical +0.05 shift
        assert a[0] == want0
        assert abs(a[0] - (b[0] + planted.VEC_SHIFT)) <= 2 * np.spacing(
            np.float32(abs(a[0]))
        )
        assert (a[1:] == b[1:]).all()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.98, cos


def test_planted_generation_idempotent(tmp_path, monkeypatch):
    monkeypatch.setattr(planted, "PLANTED_ROOT", str(tmp_path / "p"))
    docs_p, _ = planted.ensure_planted(SF)
    mtime = os.path.getmtime(docs_p)
    docs_p2, _ = planted.ensure_planted(SF)  # second call: no rewrite
    assert docs_p2 == docs_p
    assert os.path.getmtime(docs_p) == mtime
    # per-sf isolation: a different sf dir gets its own directory
    assert planted.planted_dir("/root/testdata/sf0.01") != planted.planted_dir(SF)


def test_planted_cache_invalidates_on_source_change(tmp_path, monkeypatch):
    """The cache key fingerprints the SOURCE tables (path+size+mtime): a
    regenerated corpus — or the same basename under another root — maps to
    a fresh planted dir instead of silently serving stale fixtures."""
    import shutil

    monkeypatch.setattr(planted, "PLANTED_ROOT", str(tmp_path / "p"))
    copy = tmp_path / "sf0.001"
    copy.mkdir()
    for n in ("documents.parquet", "embeddings.parquet"):
        shutil.copy(f"{SF}/{n}", copy / n)
    d1 = planted.planted_dir(str(copy))
    planted.ensure_planted(str(copy))
    # "regenerate" the corpus: same path, new bytes/mtime
    duckdb.sql(
        f"""COPY (SELECT doc_id, text || ' CHANGED' AS text
               FROM read_parquet('{SF}/documents.parquet'))
           TO '{copy / "documents.parquet"}' (FORMAT PARQUET)"""
    )
    d2 = planted.planted_dir(str(copy))
    assert d2 != d1
    docs_p, _ = planted.ensure_planted(str(copy))
    assert docs_p.startswith(d2)
    got = duckdb.sql(
        f"SELECT text FROM read_parquet('{docs_p}') ORDER BY doc_id LIMIT 1"
    ).fetchone()[0]
    assert got.endswith(" CHANGED")  # fixtures re-derived from the NEW corpus
