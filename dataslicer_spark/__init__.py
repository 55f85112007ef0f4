"""dataslicer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of MatteoGiomi/dataslicer, re-designed Spark-first.

The reference (``/root/reference``) is a single-node pandas library for
astronomical source catalogs: expression filters, broadcast-style metadata
joins, group aggregations, nearest-neighbor sky crossmatch, spatial
clustering (DBSCAN), photometric calibration arithmetic with error
propagation, IQR outlier rejection with natural-breaks binning, and an
errors-in-variables regression.  Here every operator is expressed as lazy
DataFrame transformations so Catalyst supplies predicate pushdown, column
pruning, broadcast joins, whole-stage codegen and AQE — the engine the
reference never had — and each kernel is designed to survive a 1000-executor
/ 100 TB deployment (documented per-module).

Layout:

- :mod:`dataslicer_spark.session`    — SparkSession factory tuned for scale.
- :mod:`dataslicer_spark.utils`      — schema preconditions, wildcard column
  matching, pandas-dialect expression translation.
- :mod:`dataslicer_spark.operators`  — filters, joins, aggregates, windows,
  spatial kernels, clustering, outlier rejection, regression, dedup,
  similarity search; plus the LLM-curation / classical-ML extension:
  fixed-point k-means, SemDeDup, batch-perceptron classifier training
  (hashed-BoW featurization), BPE tokenizer training, exact ridge and
  per-group OLS, PageRank, bloom-filter join pruning, market-basket
  rules — all with engine-exact (SQL-replayable) trajectories.
- :mod:`dataslicer_spark.functions`  — column-expression libraries
  (photometric calibration, coordinate transforms, text analysis).
- :mod:`dataslicer_spark.sources`    — parquet write-through cache, FITS
  source plumbing, external-catalog fetch-then-broadcast.
- :mod:`dataslicer_spark.streaming`  — event-time window aggregations (batch
  + Structured Streaming).
- :mod:`dataslicer_spark.api`        — ``SlicerFrame`` / ``SlicerDataset``,
  the user-facing wrapper mirroring the reference's ``srcdf`` / ``dataset``
  method surface (composition over a ``pyspark.sql.DataFrame``).
- :mod:`dataslicer_spark.trace`      — per-operator row-count provenance
  (the reference's logged "rows survived" invariants) via Spark
  Observations: zero extra jobs; ``SlicerFrame.traced()`` integration.
"""

__version__ = "0.1.0"
