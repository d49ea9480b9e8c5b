"""Exactly-once Structured Streaming sink into the Iceberg-style
table layer (sinks/iceberg.py).

``foreachBatch`` alone is at-least-once: Spark commits the epoch to
the checkpoint AFTER the batch function returns, so a crash in the
gap replays the whole micro-batch on restart and a plain append would
duplicate it. The standard fix (same pattern as Delta's
``txnAppId``/``txnVersion``, public) is a transactional watermark: the
(stream id, epoch id) pair is committed ATOMICALLY with the data —
here, inside the snapshot summary written under the table's commit
lock — and a replayed epoch is detected by comparing against the
table's highest committed epoch and skipped.

Epoch ids from one checkpoint are strictly monotonic, and a restarted
query replays ONLY the last uncommitted epoch, so the ``epoch <=
last`` comparison is exact: earlier epochs are committed by
definition, later ones unseen. Micro-batches of one query run
serially from one driver, so no extra locking beyond the table's own
commit lock is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sinks import iceberg


def iceberg_batch_writer(table_path: str, stream_id: str):
    """The foreachBatch function: append-once per (stream_id, epoch).
    Exposed for direct testing (a replayed call with the same epoch is
    a no-op) and for composing with per-batch transformations."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        last = iceberg.last_streaming_epoch(table_path, stream_id)
        if last is not None and epoch_id == last:
            return  # replay of the epoch the table already holds
        if last is not None and epoch_id < last:
            # epochs from ONE checkpoint are strictly monotonic and a
            # restart replays at most the last uncommitted epoch — an
            # epoch BELOW the watermark means the stream_id is being
            # reused with a fresh/reset checkpoint. Silently skipping
            # would drop every batch of the new stream; fail loudly.
            raise ValueError(
                f"epoch {epoch_id} is below the table's committed "
                f"watermark {last} for stream {stream_id!r}: the "
                "checkpoint was reset or the stream_id is reused — "
                "use a new stream_id (or table) for a new stream"
            )
        iceberg.append(
            batch_df,
            table_path,
            summary_extra={
                "streaming_query": stream_id,
                "streaming_epoch": int(epoch_id),
            },
        )

    return write_batch


def run_stream_to_iceberg(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    stream_id: str | None = None,
    available_now: bool = True,
):
    """Stream → Iceberg table with exactly-once appends; returns the
    StreamingQuery. ``stream_id`` defaults to the checkpoint path —
    the identity that survives restarts (a new checkpoint restarts
    epoch numbering, so it MUST mean a new stream id, and does)."""
    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(iceberg_batch_writer(table_path, stream_id or checkpoint))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
