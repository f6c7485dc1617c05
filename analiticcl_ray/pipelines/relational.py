"""Relational wide-aggregate and broadcast-join operators over the
TPC-H-shaped tables — the bread-and-butter groupby/join patterns a
100-TB pipeline mixes in with the dedup stages (per-partition revenue
rollups, dimension enrichment before a shuffle).

Money is quantized to integer cents at the row level BEFORE any sum, so
every aggregate is an exact int64 and the DuckDB oracle hashes
bit-identically regardless of distributed summation order (the
lm_perplexity nano-unit trick applied to currency). Rounding contract:
half-away-from-zero on positive values via ``floor(x + 0.5)`` — probed
equal to DuckDB's ``round()`` on every lineitem/orders row at sf0.01
and sf0.1, including the ~1.4% of discount products that land exactly
on a .5 cent boundary (np.round's half-even would diverge there).

Scale notes: the fact partials are per-batch combiners (one row per
group per block leaves the map stage — group cardinality is tiny), so
the only exchange is a constant-sized repartition(1) merge. Dimension sides
(nation, customer) are the blessed broadcast case: ``ray.put`` once,
zero-copy Arrow view per actor, int64 hash-index built per actor in
``__init__``. At a customer dimension too large for the object store,
swap the attach for the bucket-cogroup join in stages/verify.py
(attach_pair_sides cogroup path) — same output contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data



def _cents(x: np.ndarray) -> np.ndarray:
    """Positive money -> exact integer cents, DuckDB round() parity."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _pa_clean(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def pricing_summary(
    lineitem: "ray.data.Dataset", cutoff: str = "1998-09-02"
) -> "ray.data.Dataset":
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus),
    row count and exact cent-quantized sums of quantity, base price,
    discounted price and charge, over lineitems shipped on/before
    ``cutoff``. The per-batch combiner collapses each block to ≤ a few
    group rows, so the shuffle is constant-sized no matter the fact
    table's scale."""
    cut = np.datetime64(pd.Timestamp(cutoff), "us")

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["l_shipdate"].to_numpy().astype("datetime64[us]") <= cut]
        if not len(df):
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "sum_qty_c": pa.array([], pa.int64()),
                    "sum_base_c": pa.array([], pa.int64()),
                    "sum_disc_c": pa.array([], pa.int64()),
                    "sum_charge_c": pa.array([], pa.int64()),
                }
            )
        ext = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        tax = df["l_tax"].to_numpy()
        df = df.assign(
            qty_c=_cents(df["l_quantity"].to_numpy()),
            base_c=_cents(ext),
            disc_c=_cents(ext * (1.0 - disc)),
            charge_c=_cents(ext * (1.0 - disc) * (1.0 + tax)),
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                n_rows=("qty_c", "size"),
                sum_qty_c=("qty_c", "sum"),
                sum_base_c=("base_c", "sum"),
                sum_disc_c=("disc_c", "sum"),
                sum_charge_c=("charge_c", "sum"),
            )
            .reset_index()
        )
        for c in g.columns[2:]:
            g[c] = g[c].astype("int64")
        return _pa_clean(g)

    def _merge(batch: pa.Table) -> pa.Table:
        group = batch.to_pandas()
        out = (
            group.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                n_rows=("n_rows", "sum"),
                sum_qty_c=("sum_qty_c", "sum"),
                sum_base_c=("sum_base_c", "sum"),
                sum_disc_c=("sum_disc_c", "sum"),
                sum_charge_c=("sum_charge_c", "sum"),
            )
            .reset_index()
        )
        for c in out.columns[2:]:
            out[c] = out[c].astype("int64")
        return _pa_clean(out)

    # group cardinality is a handful (|flag|×|status|), so the partials
    # are ≤ a few rows per block: a repartition(1) merge moves almost
    # nothing and avoids a sort-shuffle whose mostly-empty partitions
    # would be pure overhead (and schema-warning noise) at any scale
    return (
        lineitem.select_columns(
            [
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
            ]
        )
        .map_batches(_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_merge, batch_format="pyarrow", batch_size=None)
    )


class _NationAttach:
    """Actor-pool stage: custkey -> nation name via two broadcast dims.
    Zero-copy Arrow views from the object store; the int64 position
    index (searchsorted over sorted custkeys) is built once per actor."""

    def __init__(self, cust_ref, nation_ref):
        cust = ray.get(cust_ref)
        nation = ray.get(nation_ref)
        ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        self.cust_keys = ck[order]
        cnk = cust["c_nationkey"].to_numpy(zero_copy_only=False)[order]
        nk = nation["n_nationkey"].to_numpy(zero_copy_only=False)
        names = np.asarray(nation["n_name"].to_pandas(), dtype=object)
        lut = np.empty(int(nk.max()) + 1, dtype=object)
        lut[nk] = names
        self.cust_nation = lut[cnk]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.cust_keys, ok)
        # inner-join semantics: drop orders with no customer row
        valid = (pos < len(self.cust_keys)) & (
            self.cust_keys[np.minimum(pos, len(self.cust_keys) - 1)] == ok
        )
        names = self.cust_nation[pos[valid]]
        cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False)[valid])
        g = (
            pd.DataFrame({"n_name": names, "rev_c": cents})
            .groupby("n_name", sort=False)
            .agg(n_orders=("rev_c", "size"), revenue_c=("rev_c", "sum"))
            .reset_index()
        )
        g["n_orders"] = g["n_orders"].astype("int64")
        g["revenue_c"] = g["revenue_c"].astype("int64")
        return _pa_clean(g)


def revenue_by_nation(
    orders: "ray.data.Dataset",
    customer: pa.Table,
    nation: pa.Table,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Revenue rollup by customer nation: orders ⋈ customer ⋈ nation,
    dims broadcast (never shuffled), fact streamed, per-batch combiner
    to ≤ |nation| rows per block, one constant-sized final merge."""
    cust_ref = ray.put(customer.select(["c_custkey", "c_nationkey"]))
    nation_ref = ray.put(nation.select(["n_nationkey", "n_name"]))

    def _merge(batch: pa.Table) -> pa.Table:
        group = batch.to_pandas()
        out = (
            group.groupby("n_name", sort=False)
            .agg(n_orders=("n_orders", "sum"), revenue_c=("revenue_c", "sum"))
            .reset_index()
        )
        out["n_orders"] = out["n_orders"].astype("int64")
        out["revenue_c"] = out["revenue_c"].astype("int64")
        return _pa_clean(out)

    # |nation| rows per block leave the attach stage; repartition(1)
    # merge (see pricing_summary) — constant-sized, never a bottleneck
    return (
        orders.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(
            _NationAttach,
            fn_constructor_args=(cust_ref, nation_ref),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .repartition(1)
        .map_batches(_merge, batch_format="pyarrow", batch_size=None)
    )


class _SegmentOrders:
    """Actor-pool stage: keep orders placed before ``cutoff`` by
    customers in the broadcast segment-custkey set (sorted int64 array,
    ``ray.put`` once, searchsorted membership per batch)."""

    def __init__(self, keys_ref, cutoff_us):
        self.keys = ray.get(keys_ref)
        self.cutoff = cutoff_us

    def __call__(self, batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.keys, ck)
        hit = (
            (od < self.cutoff)
            & (pos < len(self.keys))
            & (self.keys[np.minimum(pos, len(self.keys) - 1)] == ck)
        )
        out = batch.select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).filter(pa.array(hit))
        return out.append_column(
            "rev_c", pa.array([None] * len(out), pa.int64())
        ).replace_schema_metadata(None)


def shipping_priority(
    lineitem: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    customer: pa.Table,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
    k: int = 10,
    n_cogroups: int | None = None,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """TPC-H Q3-shaped shipping priority: top-``k`` unshipped orders of
    one market segment by outstanding revenue — the BIG-BIG join this
    module otherwise lacks (lineitem ⋈ orders are both fact-sized, so
    neither side can broadcast).

    Distribution shape: customer is the only broadcast (a sorted int64
    custkey array of the segment). The lineitem side collapses FIRST
    (per-batch combiner: filter + groupby orderkey sum of row-level
    cent-quantized revenue — one row per order per block leaves the
    map stage), then BOTH slim sides bucket-hash on orderkey and meet
    in ONE cogroup where an inner pandas merge + per-bucket top-k
    partial runs at C speed. Only ≤ k rows per bucket reach the
    constant-sized final merge. No side ever materializes on the
    driver; the bucket count scales via ``adaptive_cogroups``."""
    from ..stages.lsh import adaptive_cogroups, bucket_by_keys

    nb = n_cogroups or adaptive_cogroups(None)
    cut = np.datetime64(pd.Timestamp(cutoff), "us")
    cdf = customer.select(["c_custkey", "c_mktsegment"]).to_pandas()
    keys = np.sort(
        cdf.loc[cdf["c_mktsegment"] == segment, "c_custkey"].to_numpy(
            dtype=np.int64
        )
    )
    keys_ref = ray.put(keys)

    def _line_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        m = sd > cut
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[m]
        rev = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
        )
        g = (
            pd.DataFrame({"o_orderkey": okey, "rev_c": rev})
            .groupby("o_orderkey", sort=False)["rev_c"]
            .sum()
            .reset_index()
        )
        g["rev_c"] = g["rev_c"].astype(np.int64)
        g["o_orderdate"] = pd.Series(
            [pd.NaT] * len(g), dtype="datetime64[us]"
        )
        g["o_orderpriority"] = pd.Series([None] * len(g), dtype=object)
        return _pa_clean(
            g[["o_orderkey", "o_orderdate", "o_orderpriority", "rev_c"]]
        )

    line_side = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(_line_partial, batch_format="pyarrow")

    order_side = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        _SegmentOrders,
        fn_constructor_args=(keys_ref, cut),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _align(t: pa.Table) -> pa.Table:
        t = t.select(["o_orderkey", "o_orderdate", "o_orderpriority", "rev_c"])
        return bucket_by_keys(t, ["o_orderkey"], nb)

    both = line_side.map_batches(_align, batch_format="pyarrow").union(
        order_side.map_batches(_align, batch_format="pyarrow")
    )

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_c", "l_orderkey"],
            ascending=[False, True],
            kind="mergesort",
        ).head(k)

    def _join_bucket(g: pd.DataFrame) -> pa.Table:
        rv = g["rev_c"]
        o = g.loc[rv.isna(), ["o_orderkey", "o_orderdate", "o_orderpriority"]]
        l = (
            g.loc[rv.notna(), ["o_orderkey", "rev_c"]]
            .groupby("o_orderkey", sort=False)["rev_c"]
            .sum()
            .reset_index()
        )
        m = o.merge(l, on="o_orderkey").rename(
            columns={"o_orderkey": "l_orderkey", "rev_c": "revenue_c"}
        )
        m["revenue_c"] = m["revenue_c"].astype(np.int64)
        return _pa_clean(
            _topk(m)[
                ["l_orderkey", "revenue_c", "o_orderdate", "o_orderpriority"]
            ]
        )

    def _final(df: pd.DataFrame) -> pa.Table:
        return _pa_clean(_topk(df).reset_index(drop=True))

    return (
        both.groupby("bucket")
        .map_groups(_join_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pandas", batch_size=None)
    )
