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


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load one or more parquet tables from an sf directory.

    Returns a single DataFrame for one name, else a dict.  Scans are lazy;
    Catalyst pushes projection and predicates into the parquet reader.
    """
    dfs = {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}
    if len(names) == 1:
        return dfs[names[0]]
    return dfs
