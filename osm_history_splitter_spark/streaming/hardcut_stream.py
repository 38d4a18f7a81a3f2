"""Streaming hardcut (SURVEY §2.7): the hardcut node path is version-local
— pure map/filter against a static broadcast index — so it incrementalizes
directly as a Structured Streaming job: arriving node (or page) batches are
cell-encoded, joined to the broadcast cover (stream-static join), refined,
and appended partitioned-by-extract.

Softcut pass 1 is a global aggregation over the full history and stays a
batch job (its markers feed this stream's static side if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.spatial_join import assign_extracts
from ..plans.catalog import ExtractCatalog

__all__ = ["split_point_stream", "read_node_stream", "softcut_emit_stream"]


def read_node_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def split_point_stream(
    stream: DataFrame,
    catalog: ExtractCatalog,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming split; returns the query handle.

    ``availableNow`` drains the current backlog and stops — the batch-like
    mode used in tests; continuous deployments drop it and run triggers.
    The streaming checkpoint gives exactly-once file output — the streaming
    analog of the batch StageStore resume.
    """
    assigned = assign_extracts(stream, catalog)
    writer = (
        assigned.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .partitionBy("extract")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def softcut_emit_stream(
    stream: DataFrame,
    markers: DataFrame,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming softcut pass 2: marker tables are computed in batch (pass
    1 over the full history — inherently a global aggregation), then NEW
    arrivals stream against the STATIC markers: any arriving version of a
    tracked id is emitted to its extracts immediately (membership is by
    id, so history-completeness extends to versions that arrive later —
    exactly the reference's pass-2 semantics, incrementalized).

    ``markers``: the batch (id, extract) marker table (read from the
    StageStore checkpoint). The join is stream-static on id; Spark plans
    it as a broadcast when markers fit, else a shuffled stream-static
    join — either way the stream side is processed incrementally with
    exactly-once file output via the streaming checkpoint.
    """
    emitted = stream.join(markers, "id")
    writer = (
        emitted.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .partitionBy("extract")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
