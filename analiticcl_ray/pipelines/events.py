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

from ..stages.lsh import bucket_by_keys

# cogroup bucket count: one pandas frame per bucket inside map_groups;
# 256 buckets keeps each bucket ~1/256 of the (partial-combined) table
# (scale the constant with input size the way stages/lsh.adaptive_cogroups
# does if events ever outgrow it)
_SESSION_COGROUPS = 256


def _bucket_by(batch: pa.Table, key_cols: list[str]) -> pa.Table:
    return bucket_by_keys(batch, key_cols, _SESSION_COGROUPS)


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

    # merge the (already block-combined) partials through ONE int-keyed
    # bucket cogroup: one Python call per bucket, C-speed pandas groupby
    # inside — Ray's built-in two-column Aggregate was measured ~20x
    # slower on the same merge. sum rounded to 4 decimals: float
    # summation order differs between engines in the last ulp; the
    # rounded value is the comparable contract (exact aggregation is
    # over ints only).
    def _merge_bucket(group: pd.DataFrame) -> pa.Table:
        out = (
            group.groupby(["user_id", "window_start"], sort=False)
            .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["window_start"] = out["window_start"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].astype(float).round(4)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return (
        partial.map_batches(
            lambda t: _bucket_by(t, ["user_id", "window_start"]),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_merge_bucket, batch_format="pandas")
    )


def sessionize(
    events: "ray.data.Dataset", gap_s: int = 1800
) -> "ray.data.Dataset":
    """Session windows per user: a new session starts when the gap to
    the previous event exceeds ``gap_s``. Group-sorted by ts.
    ``sum_value`` is rounded to 4 decimals (same contract as
    tumbling_window_agg: float summation order differs between engines
    in the last ulp) so the op is DuckDB-oracle-checkable."""

    def _sessions_bucket(group: pd.DataFrame) -> pa.Table:
        # one Python call per BUCKET of users (not per user): sort the
        # whole bucket by (user, ts) once, then session boundaries,
        # session ids, and the per-session aggregate are all C-speed
        # pandas/numpy over the full bucket.
        g = group.sort_values(["user_id", "ts"], kind="mergesort").reset_index(
            drop=True
        )
        epoch = (g["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        user_change = g["user_id"].ne(g["user_id"].shift())
        new_session = (
            user_change | (epoch.diff().fillna(gap_s + 1) > gap_s)
        ).cumsum()
        out = (
            g.assign(session=new_session, epoch=epoch)
            .groupby("session", sort=True)
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
        .map_batches(lambda t: _bucket_by(t, ["user_id"]), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_sessions_bucket, batch_format="pandas")
    )
