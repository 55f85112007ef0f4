"""Diagnostic plot sinks: bounded driver sampling + import-gated render
(reference dataset_base.py:72-96, objtable.py:334-346)."""

from __future__ import annotations

import pytest

from dataslicer_spark.api import SlicerDataset, SlicerFrame
from dataslicer_spark.plotting import bounded_sample_pandas


def _has_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def test_bounded_sample_caps_rows_and_is_deterministic(spark):
    df = spark.range(10_000).selectExpr(
        "id", "cast(id % 97 as double) as v"
    )
    a = bounded_sample_pandas(df, ["id", "v"], max_rows=500)
    assert len(a) == 500
    assert list(a.columns) == ["id", "v"]
    # deterministic across runs AND partitionings (hash order, not
    # partition order)
    b = bounded_sample_pandas(df.repartition(13), ["id", "v"], max_rows=500)
    assert sorted(a["id"]) == sorted(b["id"])
    # under the cap: every row comes back
    small = bounded_sample_pandas(df.limit(42), max_rows=500)
    assert len(small) == 42


def test_bounded_sample_validates_columns(spark):
    df = spark.range(10)
    with pytest.raises(KeyError):
        bounded_sample_pandas(df, ["nope"], max_rows=10)


def test_slicerframe_sample_and_plot_gate(spark, tmp_path):
    sf = SlicerFrame(
        spark.range(1000).selectExpr(
            "cast(id as double) as mag", "cast(id % 7 as double) as err"
        )
    )
    pdf = sf.sample_pandas(["mag"], max_rows=100)
    assert len(pdf) == 100 and list(pdf.columns) == ["mag"]

    if _has_matplotlib():
        out = sf.plot_histogram("mag", plot_dir=str(tmp_path), max_rows=100)
        assert out.endswith("mag_hist.png")
        import os

        assert os.path.getsize(out) > 0
        out2 = sf.plot_scatter(
            "mag", "err", plot_dir=str(tmp_path), max_rows=100
        )
        assert os.path.getsize(out2) > 0
    else:
        # dependency gate: sampling works (above), rendering raises the
        # documented error — no silent stub
        with pytest.raises(NotImplementedError, match="matplotlib"):
            sf.plot_histogram("mag", plot_dir=str(tmp_path))
        with pytest.raises(NotImplementedError, match="matplotlib"):
            sf.plot_scatter("mag", "err", plot_dir=str(tmp_path))


def test_dataset_plot_dir_roundtrip(spark, tmp_path):
    ds = SlicerDataset(spark, "t")
    target = str(tmp_path / "plots")
    ds.set_plot_dir(target)
    assert ds.plot_dir == target

    class _FakeFig:
        def savefig(self, path, **kw):
            with open(path, "w") as f:
                f.write("fig")

    out = ds.save_fig(_FakeFig(), "diag.png")
    import os

    assert out == os.path.join(target, "diag.png")
    assert os.path.exists(out)


def test_bounded_sample_plans_take_ordered_with_pruned_scan(spark, tmp_path):
    """The cap must be a TakeOrderedAndProject (each executor keeps at
    most max_rows — no global sort, no full collect) over a scan that
    reads only the plotted columns."""
    from pyspark.sql import functions as F

    from dataslicer_spark.plotting import bounded_sample_df

    path = str(tmp_path / "wide.parquet")
    spark.range(1000).select(
        "id",
        F.col("id").cast("double").alias("a"),
        F.col("id").cast("double").alias("b"),
        F.col("id").cast("string").alias("c"),
    ).write.parquet(path)
    df = bounded_sample_df(spark.read.parquet(path), ["a"], max_rows=100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "a:double" in scan[0]
    for other in ("b:double", "c:string"):
        assert other not in scan[0]
