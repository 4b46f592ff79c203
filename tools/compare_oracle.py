"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir and compares against
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
floats canonicalized). Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v, strict: bool = True):
    """Canonicalize one cell.

    ``strict=True`` is the gate: floats compare by full ``repr`` (the
    shortest round-trip string, i.e. bit-exact), matching the driver's
    exact value hash.  ``strict=False`` is the older 9-significant-digit
    view, kept only to label near-misses — a strict FAIL that passes at
    9 digits is a representational mismatch (summation order, type
    width), not a semantic one.
    """
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if strict else f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x, strict) for x in v) + "]"
    return str(v)


def frame_key(cols, rows, strict: bool = True):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i], strict) for i in order) for r in rows)
    return [c for c in sorted(cols)], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if "sf0.01" not in sf_dir:
        # oracle_sql() has no sf parameter (the driver compares at sf0.01
        # only): the lazily-generated entries embed sf0.01 artifacts —
        # learned/IVF weights fitted on sf0.01, planted-table parquet
        # paths, PII/exact-dup text hashes — so at any other sf those
        # entries mismatch BY DESIGN, not by regression.
        print(
            f"# NOTE: {sf_dir} is not the driver's correctness sf (sf0.01); "
            "expect by-design mismatches on the sf0.01-pinned oracles: "
            "exact_dup_pairs, embedding_dup_pairs_hi, pii_scrub, "
            "learned_*/ivf_ann_cosine",
            file=sys.stderr,
        )

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from neural_locality_sensitive_hashing_spark import spark_session

    spark = spark_session("oracle-compare", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sv = frame_key(scols, srows)
        oc, ov = frame_key(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} != {oc}")
            failures.append(name)
        elif len(sv) != len(ov):
            print(f"FAIL {name}: rows {len(sv)} != {len(ov)}")
            failures.append(name)
        elif sv != ov:
            diff = [i for i, (a, b) in enumerate(zip(sv, ov)) if a != b][:3]
            _, sv9 = frame_key(scols, srows, strict=False)
            _, ov9 = frame_key(ocols, orows, strict=False)
            near = " (NEAR-MISS: matches at 9 sig digits — representational," \
                   " e.g. float summation order or type width)" if sv9 == ov9 else ""
            print(f"FAIL {name}: values differ at sorted rows {diff}{near}")
            for i in diff[:2]:
                print(f"   spark : {sv[i]}")
                print(f"   duckdb: {ov[i]}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(sv)} rows match ({time.time()-t0:.1f}s)")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
