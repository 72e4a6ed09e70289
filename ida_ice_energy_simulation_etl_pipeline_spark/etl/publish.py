"""Incremental publish: content-hash skip of unchanged outputs.

The reference's CI publishes daily but skips when a SHA-256 diff shows
nothing changed (reference scripts/push_to_huggingface.py:74-85 — the
repo's only incremental-maintenance behavior).  Re-expressed Spark-side:
the content hash is a DISTRIBUTED aggregate (xxhash64 per row, bit-XOR
combined — order-insensitive and partition-count-invariant), so no
collect of the data, no file-level hashing of terabytes.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(df: DataFrame) -> int:
    """Order-insensitive content hash: bit-XOR of per-row xxhash64 over all
    columns.  Invariant to partitioning and row order; any changed, added,
    or removed row flips it (xor of the row's hash)."""
    row = df.select(F.xxhash64(*df.columns).alias("h"))
    out = row.agg(F.bit_xor("h").alias("x"), F.count(F.lit(1)).alias("n")).collect()[0]
    # fold count in so "two identical rows removed" (xor-neutral) still changes it
    return hash((int(out["x"] or 0), int(out["n"])))


def publish_if_changed(
    df: DataFrame,
    out_path: str | Path,
    state_path: str | Path,
    *,
    key: str | None = None,
) -> bool:
    """Write ``df`` as parquet only when its content hash differs from the
    recorded one.  Returns True if published, False if skipped."""
    out_path = Path(out_path)
    state_path = Path(state_path)
    key = key or out_path.name

    state: dict[str, int] = {}
    if state_path.exists():
        state = json.loads(state_path.read_text())

    h = content_hash(df)
    if state.get(key) == h and out_path.exists():
        return False

    df.write.mode("overwrite").parquet(str(out_path))
    state[key] = h
    state_path.parent.mkdir(parents=True, exist_ok=True)
    state_path.write_text(json.dumps(state))
    return True
