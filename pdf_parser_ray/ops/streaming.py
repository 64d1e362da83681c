"""Stream-shaped operators over the ordered events log.

Ray Data has no event-time windows (ray_guide.md "Streaming-shaped
workloads"); windows are expressed as groupby(key) + per-group pandas over
the ts-sorted group. Keys are coarse-bucketed so tiny per-key groups don't
pay per-group scheduling (same pattern as ops.dedup).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_KEY_BUCKETS = 64


def sessionize(
    sf_dir: str, gap_minutes: int = 30
) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Equal timestamps can never split
    a session, so the result is deterministic under any sort tiebreak.

    Returns (user_id, session_id, session_start, session_end, n_events).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_b",
            pc.cast(
                pc.bit_wise_and(batch["user_id"], pa.scalar(_KEY_BUCKETS - 1, pa.int64())),
                pa.int64(),
            ),
        )

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["user_id", "ts"])
        new_session = (
            group.groupby("user_id")["ts"].diff().gt(gap).fillna(False).astype(int)
        )
        group["session_id"] = new_session.groupby(group["user_id"]).cumsum()
        out = group.groupby(["user_id", "session_id"], as_index=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        return out

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )
