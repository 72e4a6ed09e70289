"""Streaming sinks: exactly-once parquet landing for the event feed.

Two patterns, both replay-safe (the property that matters at 100 TB/day,
where executors WILL die mid-batch and the stream WILL be restarted):

* :func:`stream_to_parquet` — the native file sink.  Spark's sink log
  (under the checkpoint) records which files each batch committed, so a
  restarted query neither loses nor duplicates rows: exactly-once for
  file targets, no custom code.  Use this whenever the target is a
  path-addressable store.
* :func:`stream_to_parquet_batches` — the ``foreachBatch`` pattern for
  targets the native sink can't address (warehouse dirs, JDBC, custom
  layouts).  Each micro-batch lands in its own ``batch_id=N`` directory
  staged into a scratch directory and renamed into place (a single
  filesystem rename, so readers never observe a half-written batch),
  and skipped entirely when its ``_SUCCESS`` marker already exists — so
  a replayed batch id (restart after a crash between sink write and
  offset commit) is idempotent: either skipped, or re-staged and
  swapped in with the identical rows.

Both run with ``availableNow`` in tests (drain-and-stop) and unchanged
with a continuous trigger in deployment.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Callable, Sequence

from pyspark.sql import DataFrame


def stream_to_parquet(
    stream: DataFrame,
    path: str | Path,
    checkpoint: str | Path,
    *,
    partition_by: Sequence[str] = (),
    query_name: str = "parquet_sink",
) -> object:
    """Drain the stream into a parquet directory via the NATIVE file sink
    (exactly-once through the checkpoint's sink log)."""
    writer = (
        stream.writeStream.format("parquet")
        .queryName(query_name)
        .option("path", str(path))
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()
    return q


def idempotent_batch_writer(path: str | Path) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to its own
    ``batch_id=N`` directory, idempotently (see module docstring).

    The batch is STAGED into ``_staging_batch_id=N`` and renamed into
    place: Spark's own ``overwrite`` mode deletes-then-rewrites the
    target non-atomically, so a concurrent reader (or a second crash
    mid-rewrite) could observe partial data — the rename makes the
    directory appear fully formed or not at all.  ``_SUCCESS`` inside
    the committed directory remains the replay-skip marker; leftover
    staging/uncommitted directories from a crash are simply re-staged.
    (Local-FS semantics; on an object store, point the sink at the
    native file sink in :func:`stream_to_parquet` instead, whose sink
    log gives exactly-once without renames.)"""
    root = Path(path)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        target = root / f"batch_id={batch_id}"
        if (target / "_SUCCESS").exists():
            return  # replayed batch already fully committed — skip
        staging = root / f"_staging_batch_id={batch_id}"
        batch_df.write.mode("overwrite").parquet(str(staging))
        if target.exists():
            shutil.rmtree(target)  # uncommitted debris from a prior crash
        staging.rename(target)

    return write


def stream_to_parquet_batches(
    stream: DataFrame,
    path: str | Path,
    checkpoint: str | Path,
    *,
    query_name: str = "batch_sink",
) -> object:
    """Drain the stream through :func:`idempotent_batch_writer` — the
    ``foreachBatch`` exactly-once pattern for non-file-sink targets."""
    q = (
        stream.writeStream.foreachBatch(idempotent_batch_writer(path))
        .queryName(query_name)
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def upsert_batch_writer(
    spark,
    path: str | Path,
    keys: Sequence[str],
    partition_col: str,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function that MERGEs each micro-batch into a
    partitioned parquet table by key (:func:`..etl.load.merge_upsert_parquet`).

    This is the streaming-upsert-to-warehouse pattern: run a watermarked
    aggregation in ``update`` output mode so each trigger emits only the
    windows it changed, and merge those rows into the serving table keyed
    on the window identity — late data re-emits its window and the merge
    REPLACES the stale row, so the table converges to the batch answer
    instead of accumulating one append per revision.  Replay-safe without
    markers: re-merging the same rows is a no-op by construction
    (idempotent by key, unlike an append sink).
    """
    from ..etl.load import merge_upsert_parquet

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert_parquet(
            spark, batch_df, path, keys=list(keys), partition_col=partition_col
        )

    return write


def stream_upsert_rollup(
    rollup: DataFrame,
    path: str | Path,
    checkpoint: str | Path,
    keys: Sequence[str],
    partition_col: str,
    *,
    query_name: str = "upsert_sink",
) -> object:
    """Drain an update-mode rollup stream into a merged serving table."""
    spark = rollup.sparkSession
    q = (
        rollup.writeStream.foreachBatch(
            upsert_batch_writer(spark, path, keys, partition_col)
        )
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
