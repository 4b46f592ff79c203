"""SparkSession factory tuned for the dedup engine.

Defaults chosen for 100 TB-scale semantics even though tests run on
``local[N]``: AQE on (runtime re-plan + skew-join splitting), Arrow on
(every UDF in this engine is a pandas UDF), UTC session timezone (oracle
comparison against DuckDB), shuffle partitions sized to the parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_TMPFS_MIN_FREE_BYTES = 2 * 1024**3


def _tmpfs_scratch(path: str = "/dev/shm/spark-scratch") -> str | None:
    """tmpfs scratch dir iff opted in AND the mount has real headroom."""
    if os.environ.get("SPARK_GRAFT_TMPFS", "") != "1":
        return None
    mount = os.path.dirname(path)
    if not os.path.isdir(mount):
        return None
    st = os.statvfs(mount)
    if st.f_bavail * st.f_frsize < _TMPFS_MIN_FREE_BYTES:
        return None
    os.makedirs(path, exist_ok=True)
    return path


def spark_session(
    app_name: str = "nlsh-spark-dedup",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale the caller passes ~2-3x total executor cores instead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpus; real cluster masters keep 2x cpus.
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 2 * cpus

    # Optional shuffle scratch on tmpfs — OPT-IN via SPARK_GRAFT_TMPFS=1
    # (benchmark harnesses set it): many hosts mount /dev/shm at 64 MB
    # (Docker default), where spilling shuffle data to tmpfs fails with
    # no-space or silently eats RAM. When opted in, the mount must also
    # have headroom (>= 2 GiB free) or we fall back to the default
    # local dir. Rationale for the benchmarks: this sandbox's /tmp sits
    # on a single-queue virtual disk that serializes shuffle I/O across
    # task threads; real clusters give each executor its own local disks.
    scratch = _tmpfs_scratch()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    if scratch:
        builder = builder.config("spark.local.dir", scratch)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
