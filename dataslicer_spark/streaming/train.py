"""Online model training over a stream — one integer-exact gradient
step per micro-batch.

The streaming twin of ``operators/classifier.batch_perceptron_fit``: a
``foreachBatch`` sink holds the weight vector (d+1 ints of driver
state) and applies one batch-perceptron step per arriving micro-batch.
Because each step is the same order-independent int64 aggregate the
offline trainer runs, the streamed model is EXACTLY the model you get
by replaying the same micro-batches offline in arrival order — pinned
by a parity test, which is more than float SGD pipelines can promise.

Determinism caveat, stated plainly: the trajectory depends on the
micro-batch PARTITIONING of the data (one step per batch), so it is
reproducible given the same trigger sequence (e.g. ``maxFilesPerTrigger=1``
over sorted files) but differs from a single offline epoch over the
union — the usual online-vs-batch distinction, not an implementation
artifact.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.classifier import batch_perceptron_fit


def stream_perceptron_train(
    spark: SparkSession,
    source_path: str,
    schema,
    feature_cols: list[str],
    label_col: str,
    lr: int = 1,
    init_weights: list[int] | None = None,
    max_files_per_trigger: int = 1,
):
    """Train over a file stream (``availableNow`` — drains the backlog
    and stops, the batch-refresh pattern).  Returns
    ``(weights, n_batches)``.

    Each micro-batch runs ONE epoch from the current weights; the
    foreachBatch closure mutates the driver-held vector.  Scale shape is
    the offline trainer's: per-partition partial gradients, a d-vector
    per partition on the wire, executors never see the weights except as
    broadcast literals.
    """
    state = {
        "w": list(init_weights) if init_weights else None,
        "n": 0,
    }

    def step(batch_df, _batch_id: int) -> None:
        state["w"] = batch_perceptron_fit(
            batch_df,
            feature_cols,
            label_col,
            n_epochs=1,
            lr=lr,
            init_weights=state["w"],
        )
        state["n"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
        .writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if state["w"] is None:
        state["w"] = [0] * (1 + len(feature_cols))
    return state["w"], state["n"]


__all__ = ["stream_perceptron_train"]
