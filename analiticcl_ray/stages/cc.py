"""Connected components over the verified pair graph.

The clustering step the north rule adds on top of analiticcl's
variant matching (the reference's reverse index, src/index.rs:14-23,
maps each lexicon item to its observed variants — here each cluster
representative maps to its member rows).

Two interchangeable implementations (SURVEY.md §2.6 CC):

- ``cc_label_propagation``: the scale path. Iterative min-label
  propagation expressed purely in Ray Data — per round, a cogrouped
  union of (node, label) rows with (node, neighbor) edge rows lets each
  node push its current label to every neighbor inside
  ``groupby(node).map_groups``, and a second groupby takes the min.
  Every shuffle is edge-list-sized (never the corpus); no driver-side
  state. Converges in O(component diameter) rounds (dup clusters are
  star/chain shaped, so a handful); convergence is detected with an
  order-independent label checksum computed as a Dataset aggregate.
  Rounds are materialized to keep lineage bounded (checkpointable).

- ``cc_union_find``: driver-side union-find, used when the edge list is
  provably small (it is the *verified duplicate* set, orders of
  magnitude smaller than the corpus). O(E α(E)) and exact.

Both return a Dataset (image_id, cluster_id) over nodes that appear in
at least one pair; cluster_id = lexicographically smallest member id
(deterministic representative — analiticcl's "preferred reference form"
analog). Singleton rows (no pairs) are implicitly their own cluster and
are added back by the pipeline, not here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def cc_union_find(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Driver union-find over a (small) verified-pairs dataset."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for batch in pairs.select_columns(["src_id", "dst_id"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch["src_id"].to_pylist(), batch["dst_id"].to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    rows = {"image_id": [], "cluster_id": []}
    for node in parent:
        rows["image_id"].append(node)
        rows["cluster_id"].append(find(node))
    if not rows["image_id"]:
        return ray.data.from_arrow(
            pa.table(
                {"image_id": pa.array([], pa.string()),
                 "cluster_id": pa.array([], pa.string())}
            )
        )
    return ray.data.from_arrow(
        pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    )


def _label_checksum(labels: "ray.data.Dataset") -> float:
    """Order-independent convergence fingerprint as a Dataset aggregate."""
    from ..stages.signatures import hash_u64

    def _h(batch: pa.Table) -> pa.Table:
        hs = np.array(
            [
                hash_u64(f"{i}={c}".encode()) % (1 << 52)
                for i, c in zip(
                    batch["image_id"].to_pylist(), batch["cluster_id"].to_pylist()
                )
            ],
            dtype=np.float64,
        )
        return pa.table({"h": pa.array(hs, pa.float64())})

    out = labels.map_batches(_h, batch_format="pyarrow").aggregate(Sum("h", alias_name="s"))
    return float(out["s"] or 0.0)


def cc_label_propagation(
    pairs: "ray.data.Dataset", max_rounds: int = 50
) -> "ray.data.Dataset":
    """Distributed min-label propagation; all shuffles edge-sized."""
    edges = pairs.select_columns(["src_id", "dst_id"]).materialize()

    def _init(batch: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [batch["src_id"].combine_chunks(), batch["dst_id"].combine_chunks()]
        )
        return pa.table({"image_id": ids, "cluster_id": ids})

    labels = (
        edges.map_batches(_init, batch_format="pyarrow")
        .groupby("image_id")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .materialize()
    )

    # symmetric half-edges once, reused every round
    def _sym(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": pa.concat_arrays(
                    [batch["src_id"].combine_chunks(), batch["dst_id"].combine_chunks()]
                ),
                "neighbor": pa.concat_arrays(
                    [batch["dst_id"].combine_chunks(), batch["src_id"].combine_chunks()]
                ),
            }
        )

    half_edges = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    prev = _label_checksum(labels)
    for _round in range(max_rounds):
        # cogroup: label row (neighbor=null) + half-edges for the node
        def _lab_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "image_id": batch["image_id"].combine_chunks(),
                    "neighbor": pa.nulls(len(batch), pa.string()),
                    "label": batch["cluster_id"].combine_chunks(),
                }
            )

        def _edge_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "image_id": batch["image_id"].combine_chunks(),
                    "neighbor": batch["neighbor"].combine_chunks(),
                    "label": pa.nulls(len(batch), pa.string()),
                }
            )

        def _push(group: pd.DataFrame) -> pd.DataFrame:
            lab_rows = group[group["neighbor"].isna()]
            if lab_rows.empty:
                return pd.DataFrame({"image_id": [], "cluster_id": []})
            label = lab_rows["label"].min()
            targets = group.loc[group["neighbor"].notna(), "neighbor"].tolist()
            targets.append(group["image_id"].iloc[0])  # keep own label
            return pd.DataFrame(
                {"image_id": targets, "cluster_id": [label] * len(targets)}
            )

        pushed = (
            labels.map_batches(_lab_rows, batch_format="pyarrow")
            .union(half_edges.map_batches(_edge_rows, batch_format="pyarrow"))
            .groupby("image_id")
            .map_groups(_push, batch_format="pandas")
        )
        labels = (
            pushed.groupby("image_id")
            .map_groups(
                lambda g: g.sort_values("cluster_id").head(1), batch_format="pandas"
            )
            .materialize()
        )
        cur = _label_checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels
