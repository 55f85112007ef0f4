"""Co-located joins via bucketed tables: writing both sides bucketed by the
join key lets Catalyst plan the join with NO shuffle exchange — the
pre-partitioning strategy SURVEY.md §2.3 calls for on big-big joins that
recur at 100 TB (one-time bucketed write amortizes every later join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, lineitem, orders):
    # tables land in the default spark-warehouse dir (gitignored);
    # warehouse.dir is a static conf and cannot be pointed at a tempdir
    if True:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        (lineitem.withColumnRenamed("l_orderkey", "k")
         .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
         .saveAsTable("li_b"))
        (orders.withColumnRenamed("o_orderkey", "k")
         .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
         .saveAsTable("ord_b"))

        li = spark.table("li_b")
        od = spark.table("ord_b").select("k", "o_custkey")
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = li.join(od, "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            # the payoff: bucket layout satisfies the join's distribution —
            # no shuffle exchange on either side
            assert "Exchange hashpartitioning" not in plan
            assert joined.count() == lineitem.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS li_b")
            spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_spatial_cells_join_no_shuffle(spark):
    """The J5 scale claim (spatial.py docstring): a lake bucketed by the
    spatial cell id runs the crossmatch's candidate equi-join with no
    shuffle exchange.  Cells here are the same dec-band × cos-widened RA
    construction crossmatch_sky derives on the fly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n = 2000
    eps_deg = 3.0 / 3600.0
    src = pd.DataFrame(
        {
            "sid": range(n),
            "ra": rng.uniform(0, 10, n),
            "dec": rng.uniform(-5, 5, n),
        }
    )
    cat = pd.DataFrame(
        {
            "cid": range(n // 2),
            "ra": rng.uniform(0, 10, n // 2),
            "dec": rng.uniform(-5, 5, n // 2),
        }
    )

    def with_cells(df, explode_neighbors):
        band0 = F.floor(F.col("dec") / eps_deg).cast("long")
        out = df.withColumn(
            "band",
            F.explode(F.array(*[band0 + F.lit(d) for d in (-1, 0, 1)]))
            if explode_neighbors
            else band0,
        )
        dec_edge = F.greatest(
            F.abs(F.col("band").cast("double") * eps_deg),
            F.abs((F.col("band").cast("double") + 1) * eps_deg),
        )
        w = eps_deg / F.greatest(F.cos(F.radians(dec_edge)), F.lit(1e-6))
        if explode_neighbors:
            lo = F.floor((F.col("ra") - eps_deg) / w).cast("long")
            hi = F.floor((F.col("ra") + eps_deg) / w).cast("long")
            out = out.withColumn("rcell", F.explode(F.sequence(lo, hi)))
        else:
            out = out.withColumn("rcell", F.floor(F.col("ra") / w).cast("long"))
        return out

    s_cells = with_cells(spark.createDataFrame(src), explode_neighbors=False)
    c_cells = with_cells(spark.createDataFrame(cat), explode_neighbors=True).select(
        "band", "rcell", F.col("cid"), F.col("ra").alias("cra"),
        F.col("dec").alias("cdec"),
    )
    spark.sql("DROP TABLE IF EXISTS src_cells_b")
    spark.sql("DROP TABLE IF EXISTS cat_cells_b")
    s_cells.write.bucketBy(8, "band", "rcell").mode("overwrite").saveAsTable(
        "src_cells_b"
    )
    c_cells.write.bucketBy(8, "band", "rcell").mode("overwrite").saveAsTable(
        "cat_cells_b"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("src_cells_b").join(
            spark.table("cat_cells_b"), ["band", "rcell"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan

        # correctness: candidate pairs within radius == brute force
        from dataslicer_spark.functions.photometry import haversine_arcsec

        pairs = (
            joined.withColumn(
                "d", haversine_arcsec(F.col("ra"), F.col("dec"),
                                      F.col("cra"), F.col("cdec"))
            )
            .filter(F.col("d") <= 3.0)
            .select("sid", "cid")
            .distinct()
        )
        got = {(r.sid, r.cid) for r in pairs.collect()}

        sra, sdec = np.radians(src.ra.to_numpy()), np.radians(src.dec.to_numpy())
        cra, cdec = np.radians(cat.ra.to_numpy()), np.radians(cat.dec.to_numpy())
        s_vec = np.column_stack(
            [np.cos(sdec) * np.cos(sra), np.cos(sdec) * np.sin(sra), np.sin(sdec)]
        )
        c_vec = np.column_stack(
            [np.cos(cdec) * np.cos(cra), np.cos(cdec) * np.sin(cra), np.sin(cdec)]
        )
        chord = 2 * np.sin(np.radians(3.0 / 3600.0) / 2)
        d2 = ((s_vec[:, None, :] - c_vec[None, :, :]) ** 2).sum(axis=2)
        expect = {
            (int(i), int(j))
            for i, j in zip(*np.where(d2 <= chord * chord))
        }
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS src_cells_b")
        spark.sql("DROP TABLE IF EXISTS cat_cells_b")
