from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from neural_locality_sensitive_hashing_spark import spark_session

    s = spark_session("pytest", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_1k(tmp_path_factory):
    from neural_locality_sensitive_hashing_spark.datagen import write_pages_dataset

    out = tmp_path_factory.mktemp("webtext")
    return write_pages_dataset(str(out), 1000, seed=42)
