"""Metrics/log sink — the engine's analog of the reference's
tf.summary.FileWriter + per-step scalar logging (S10/S11, train.py:
102,156-161): an append-mode parquet log table keyed by (run_id, step),
readable back as a DataFrame for A3-style per-epoch rollups.

Append-mode parquet is the 100 TB-safe shape: each append is a new file
(no read-modify-write), writers never coordinate, and readers prune by
run_id/step like any other table. Checkpoint artifacts (S10) are out of
engine scope; this logs the training metrics stream itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "run_id string, epoch int, step bigint, metric string, value double, "
    "logged_at timestamp"
)


class MetricsLog:
    """Tiny append-only metrics table over a parquet directory."""

    def __init__(self, path: str):
        self.path = path

    def append(
        self, spark: SparkSession, run_id: str, rows: list[tuple[int, int, str, float]]
    ) -> None:
        """rows: (epoch, step, metric, value). Timestamped server-side."""
        df = spark.createDataFrame(
            [(run_id, e, s, m, v) for (e, s, m, v) in rows],
            "run_id string, epoch int, step bigint, metric string, value double",
        ).withColumn("logged_at", F.current_timestamp())
        df.write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(METRICS_SCHEMA).parquet(self.path)

    def epoch_summary(self, spark: SparkSession, run_id: str) -> DataFrame:
        """Per-epoch metric means — the reference's np.mean(train_loss_list)
        per epoch (A3, train.py:52-53,141-142) as a grouped aggregation."""
        return (
            self.read(spark)
            .filter(F.col("run_id") == run_id)
            .groupBy("epoch", "metric")
            .agg(F.avg("value").alias("mean_value"), F.count(F.lit(1)).alias("n_steps"))
        )
