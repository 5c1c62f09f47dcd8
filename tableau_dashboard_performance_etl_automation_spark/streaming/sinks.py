"""Streaming sinks: the exactly-once ``foreachBatch`` parquet writer.

Structured Streaming's contract is at-least-once per micro-batch
after a failure: a batch whose side effects ran but whose checkpoint
commit didn't land is REPLAYED with the same ``batch_id``. A sink
that appends blindly therefore duplicates rows on recovery. The
standard fix — implemented here — is an idempotent writer keyed on
``batch_id``:

- each batch lands in its own subdirectory ``batch_id=<n>/`` (a
  normal partitioned-parquet layout, so downstream readers just
  ``spark.read.parquet(target)``);
- a zero-byte commit marker ``_committed_<n>`` in the target root is
  written AFTER the data; a replayed batch sees its marker and skips.

The marker write is the linearization point: parquet files without a
marker are from a failed attempt and are overwritten (mode
``overwrite`` per batch directory) before the marker lands, so
readers that filter to committed batch ids never see partial output.
At scale this is the same ledger trick table formats (Delta/Iceberg)
formalize; the point here is the engine-level pattern with no extra
dependency.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def committed_batch_ids(target_dir: str) -> set[int]:
    """Batch ids with a commit marker in ``target_dir``."""
    try:
        names = os.listdir(target_dir)
    except FileNotFoundError:
        return set()
    return {
        int(n.rsplit("_", 1)[1])
        for n in names
        if n.startswith("_committed_")
    }


def write_batch_idempotent(
    batch_df: DataFrame, batch_id: int, target_dir: str
) -> bool:
    """The ``foreachBatch`` body: write one micro-batch exactly once.

    Returns True if this call performed the write, False if the batch
    was already committed (replay after recovery). Overwrite-then-mark
    ordering makes a half-written previous attempt invisible.
    """
    if batch_id in committed_batch_ids(target_dir):
        return False
    batch_df.write.mode("overwrite").parquet(
        os.path.join(target_dir, f"batch_id={batch_id}")
    )
    os.makedirs(target_dir, exist_ok=True)
    with open(
        os.path.join(target_dir, f"_committed_{batch_id}"), "w"
    ) as fh:
        fh.write("")
    return True


def idempotent_parquet_sink(
    stream: DataFrame, target_dir: str, checkpoint_dir: str
):
    """Attach the idempotent writer to a streaming DataFrame.

    Returns the started query (``availableNow`` trigger — drain the
    source then stop, the batch-replay-safe backfill mode).
    """
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: write_batch_idempotent(df, bid, target_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
