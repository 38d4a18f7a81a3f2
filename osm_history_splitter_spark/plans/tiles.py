"""XYZ tile materialization — the web-map-serving shape of the splitter's
extract fan-out (reference analog: the multi-output writer of ``cut.hpp:73``,
with extracts generalized to the slippy-map tile grid).

Layout design for 10^12 rows: partitioning directly by (tx, ty) at z=8 would
mean 65k output directories per commit — a metadata storm. Instead the
directory key is the QUADKEY PREFIX (z=3 by default: 64 dirs), and rows are
range/sort-clustered by full quadkey inside each directory, so file-level
min/max stats on ``qk`` prune any deeper tile lookup (quadkey prefix
containment IS tile ancestry — the same trick as the Z-order write
clustering in ``functions/grid.py``). Streaming and batch writers share the
key derivation, and the streaming checkpoint gives exactly-once appends —
the streaming analog of the batch StageStore resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.grid import quadkey_expr, tile_xy_expr

__all__ = ["with_tile_keys", "write_tiles", "tile_stream"]


def with_tile_keys(
    df: DataFrame, z: int, prefix_len: int = 3
) -> DataFrame:
    """Attach (tx, ty, qk, tile_prefix) at zoom ``z`` — pure Catalyst."""
    if not 1 <= prefix_len <= z:
        raise ValueError(f"prefix_len must be in [1, {z}], got {prefix_len}")
    tx, ty = tile_xy_expr(F.col("lon"), F.col("lat"), z)
    return (
        df.withColumn("tx", tx)
        .withColumn("ty", ty)
        .withColumn("qk", quadkey_expr(F.col("lon"), F.col("lat"), z))
        .withColumn("tile_prefix", F.substring(F.col("qk"), 1, prefix_len))
    )


def write_tiles(
    df: DataFrame, z: int, out_path: str, prefix_len: int = 3
) -> None:
    """Batch tile write: directory per quadkey prefix, rows sorted by full
    quadkey within files (stats-prunable tile lookups)."""
    keyed = with_tile_keys(df, z, prefix_len)
    (
        keyed.repartition("tile_prefix")
        .sortWithinPartitions("qk")
        .write.mode("overwrite")
        .partitionBy("tile_prefix")
        .parquet(out_path)
    )


def tile_stream(
    stream: DataFrame,
    z: int,
    out_path: str,
    checkpoint_path: str,
    prefix_len: int = 3,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin: tile-key the arriving batches (stateless projection —
    no watermark needed) and append under the same prefix layout."""
    keyed = with_tile_keys(stream, z, prefix_len)
    writer = (
        keyed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .partitionBy("tile_prefix")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
