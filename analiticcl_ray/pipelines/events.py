"""Stream-shaped operations over the ``events`` table.

Ray Data is a batch engine (like the reference — SURVEY.md §2.10: no
windows/watermarks anywhere in analiticcl); stream semantics are
expressed as partition-by-key + sort-within-group transforms
(ray_guide.md "Streaming-shaped workloads"). Ordering assumption: each
group is sorted by ``ts`` inside the transform itself, so input block
order never matters.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def tumbling_window_agg(
    events: "ray.data.Dataset", window_s: int = 3600
) -> "ray.data.Dataset":
    """Per (user, tumbling window): event count and value sum.
    window_start = floor(epoch_seconds / window_s) * window_s as an
    epoch integer (bit-identical to the SQL oracle's integer division)."""

    def _win(batch: pa.Table) -> pa.Table:
        df = batch.select(["user_id", "ts", "value"]).to_pandas()
        # unit-independent epoch seconds (pandas may carry ns or us)
        epoch = (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        df["window_start"] = (epoch // window_s) * window_s
        g = (
            df.groupby(["user_id", "window_start"], sort=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partial = events.map_batches(_win, batch_format="pyarrow")

    def _merge(group: pd.DataFrame) -> pa.Table:
        # sum rounded to 4 decimals: float summation order differs
        # between engines in the last ulp; the rounded value is the
        # comparable contract (exact aggregation is over ints only).
        # Emits metadata-free Arrow so Ray's reduce-side schema dedup
        # keeps hashing (a pandas return carries a b'pandas' blob).
        return pa.table(
            {
                "user_id": pa.array([int(group["user_id"].iloc[0])], pa.int64()),
                "window_start": pa.array(
                    [int(group["window_start"].iloc[0])], pa.int64()
                ),
                "n_events": pa.array([int(group["n_events"].sum())], pa.int64()),
                "sum_value": pa.array(
                    [round(float(group["sum_value"].sum()), 4)], pa.float64()
                ),
            }
        )

    return partial.groupby(["user_id", "window_start"]).map_groups(
        _merge, batch_format="pandas"
    )


def sessionize(
    events: "ray.data.Dataset", gap_s: int = 1800
) -> "ray.data.Dataset":
    """Session windows per user: a new session starts when the gap to
    the previous event exceeds ``gap_s``. Group-sorted by ts.
    ``sum_value`` is rounded to 4 decimals (same contract as
    tumbling_window_agg: float summation order differs between engines
    in the last ulp) so the op is DuckDB-oracle-checkable."""

    def _sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts").reset_index(drop=True)
        epoch = (g["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        new_session = (epoch.diff().fillna(gap_s + 1) > gap_s).cumsum()
        out = (
            g.assign(session=new_session, epoch=epoch)
            .groupby("session")
            .agg(
                user_id=("user_id", "first"),
                session_start=("epoch", "min"),
                session_end=("epoch", "max"),
                n_events=("ts", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].astype(float).round(4)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return (
        events.select_columns(["user_id", "ts", "value"])
        # parquet files written via pandas carry a b'pandas' schema blob;
        # strip it before the shuffle so Ray's reduce-side schema dedup
        # can hash the block schemas (zero-copy)
        .map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(_sessions, batch_format="pandas")
    )
