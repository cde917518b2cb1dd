"""Streaming ingestion (reference micro-batch pipeline, SURVEY §2.10).

The reference pulls fixed-size batches from a file iterator
(``ForwardSecureANNSystem.indexStream:438-471``, BATCH_SIZE=100k) and
checks key-rotation thresholds per batch.  Spark-native equivalent:
Structured Streaming file source with ``maxFilesPerTrigger`` →
``foreachBatch`` sink that encrypts + appends each micro-batch and runs
the rotation policy hook (St1 + St2).  Backpressure/flush (St3) is the
writer's job in Spark; the background re-encryption job (St4) is the
same ``reencrypt_touched`` plan on a trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_vectors(spark: SparkSession, path: str, schema: str,
                   max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of vector rows (parquet drops into a directory)."""
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def ingest_encrypted(stream_df: DataFrame, out_path: str,
                     checkpoint: str, key_manager, spark: SparkSession,
                     rotation_hook=None, available_now: bool = True):
    """St1+St2: per micro-batch — rotate-if-needed, encrypt under the
    current key, append to the encrypted store.

    ``key_manager`` lives on the driver (foreachBatch runs driver-side);
    executors only ever see the broadcast key map inside the encrypt
    kernel.  Returns the StreamingQuery."""
    from ..crypto.aes import encrypt_vectors

    def handle(batch_df: DataFrame, batch_id: int):
        n = batch_df.count()
        if n == 0:
            return
        key_manager.record_ops(n)
        rotated = key_manager.rotate_if_needed()
        if rotated is not None and rotation_hook is not None:
            rotation_hook(rotated)
        bc = spark.sparkContext.broadcast(key_manager.key_map())
        enc = encrypt_vectors(batch_df, bc, key_manager.current_version)
        (enc.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("key_version")
            .parquet(out_path))

    writer = (stream_df.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(stream_df: DataFrame,
                          window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling-window aggregation with late-data watermark —
    the streaming form of workloads.q_event_window_agg (batch twin keeps
    the oracle; this keeps state bounded for infinite streams)."""
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.col("window.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))
