"""SimHash (64-bit) as a batched, vectorized pandas UDF.

SimHash of a shingle-hash set: bit i of the output is 1 iff more than half
of the set's hashes have bit i set. Near-duplicate docs differ in few bits;
verification is native ``bit_count(a ^ b) <= t`` (Hamming ball), fully
JVM-side. This is the engine's second verifier (SURVEY.md §2.8), feeding
extra verified pairs into the same union-find as MinHash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_BITS = np.arange(64, dtype=np.uint64)


def simhash_numpy(shingle_hashes: np.ndarray) -> int:
    """Reference single-set implementation (tests + driver-side use)."""
    h = np.asarray(shingle_hashes, dtype=np.int64).view(np.uint64)
    bits = ((h[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int32)
    counts = bits.sum(axis=0)
    code = np.uint64(0)
    for i in range(64):
        if 2 * counts[i] >= len(h):
            code |= np.uint64(1) << np.uint64(i)
    return int(code.astype(np.int64).view(np.int64))


@pandas_udf(LongType())
def simhash_udf(hashes: pd.Series) -> pd.Series:
    """array<bigint> shingle hashes -> bigint simhash code (null-safe)."""
    arrs = []
    keep = np.zeros(len(hashes), dtype=bool)
    for i, v in enumerate(hashes):
        if v is None or len(v) == 0:
            continue
        if isinstance(v, (bytes, bytearray)):
            arrs.append(np.frombuffer(v, dtype="<u8"))
        else:
            arrs.append(np.asarray(v, dtype=np.int64).view(np.uint64))
        keep[i] = True
    out = np.full(len(hashes), np.nan, dtype=object)
    if arrs:
        flat = np.concatenate(arrs)
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=len(arrs))
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        bits = ((flat[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int8)
        counts = np.add.reduceat(bits.astype(np.int64), starts, axis=0)  # (nrows, 64)
        majority = (2 * counts >= lens[:, None]).astype(np.uint64)
        codes = (majority << _BITS[None, :]).sum(axis=1, dtype=np.uint64).view(np.int64)
        k = 0
        for i in range(len(hashes)):
            if keep[i]:
                out[i] = int(codes[k])
                k += 1
    return pd.Series(out, dtype="object")


def hamming_distance(a: Column, b: Column) -> Column:
    """Native JVM Hamming distance between two int64 simhash codes."""
    return F.bit_count(a.bitwiseXOR(b))
