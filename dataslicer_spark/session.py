"""SparkSession factory.

Local-mode defaults are tuned for the test harness (``local[N]``, one JVM),
but every knob is chosen so the same code runs unchanged on a real cluster:
AQE handles skew and partition coalescing at runtime, shuffle partitions
default to a cluster-friendly value that AQE coalesces down locally, and
Arrow is enabled for the Pandas-UDF kernels (DBSCAN, ODR, similarity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "dataslicer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    On a cluster, drop ``master`` (spark-submit supplies it) — every other
    setting carries over.  AQE is on so runtime statistics re-plan joins
    (broadcast conversion, skew-join splitting, partition coalescing).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # allow Python DataSource readers (sources/fits_datasource.py) to
        # receive pushed filters via pushFilters (Spark 4.1 opt-in)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "64g"))
        # whole-stage codegen emits one JIT-compiled class per plan
        # fragment; with ~76 registered queries the JDK-default 240 MB
        # code cache saturates mid-run and HotSpot silently stops
        # compiling — later large plans then run interpreted (measured:
        # the flagship pipeline degrades 16 s → 74 s when scheduled after
        # the full registry).  1 GiB gives the local single-JVM harness
        # the same headroom a long-lived cluster driver/executor gets.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
    )
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_conf(
    executors: int = 1000,
    cores_per_executor: int = 4,
    target_partition_mb: int = 128,
) -> dict[str, str]:
    """Recommended conf overrides for a real multi-executor deployment —
    pass as ``extra_conf`` to :func:`get_spark` (or to spark-submit).

    Rationale per knob:

    - ``shuffle.partitions`` ≈ 2-3× total cores: every core busy through
      stragglers, partitions still big enough to amortize task overhead;
      AQE coalesces down when a stage's output is small.
    - ``files.maxPartitionBytes`` fixes scan-task size; with 128 MB
      parquet row groups a 100 TB scan is ~800k tasks — fine — while
      keeping per-task memory bounded.
    - ``advisoryPartitionSizeInBytes`` gives AQE the same target for
      post-shuffle coalescing and skew-split sizing.
    - ``autoBroadcastJoinThreshold`` stays conservative (64 MB): our
      dimension tables (metadata, calibrators, dust, centroids) are
      well under it; bigger sides should shuffle, not OOM the driver.
    - ``shuffle.service.enabled`` / speculation: standard long-job
      hygiene on shared clusters (harmless locally, left to deployment).
    """
    total_cores = executors * cores_per_executor
    return {
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            target_partition_mb * 1024 * 1024
        ),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load one or more parquet tables from an sf directory.

    Returns a single DataFrame for one name, else a dict.  Scans are lazy;
    Catalyst pushes projection and predicates into the parquet reader.
    """
    dfs = {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}
    if len(names) == 1:
        return dfs[names[0]]
    return dfs
