"""Distributed connected components by min-label propagation — the
100-TB replacement for the driver-side union-find in near-dedup
clustering (dedup.near_dedup keeps union-find for pair lists that fit
the driver; this path never materializes edges or labels in one
place).

Algorithm (classic label propagation / a simplified "hash-to-min"):
every node starts labeled with itself; each round, every node takes
the minimum label among itself and its neighbors (edges are
symmetrized once); stop when a round changes nothing.  Each round is
ONE distributed hash join (edges x labels co-partitioned on the
neighbor column) plus one groupby-min — both mergeable, no driver
state.  Rounds needed = graph diameter; duplicate-cluster graphs are
near-cliques (diameter ~= 2), so 3-4 rounds close them.

The per-round change count is the only thing the driver sees.

Scope note (measured): rounds scale with graph DIAMETER, and each
round pays Ray Data's fixed per-dataset cost — this operator is built
for the dedup-cluster regime (near-clique components, pair graphs ≪
corpus), not for general large-diameter graph analytics (that calls
for a star-contraction / pointer-doubling variant, whose extra
per-round join was measured to cost more than it saved here)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components"]


def connected_components(edges, max_rounds: int = 25, n_parts: int = 32):
    """``edges``: a Ray Dataset (or pandas DataFrame) with int64
    columns (a, b).  Returns a pandas DataFrame (node, component) where
    component = min node id reachable — one row per node that appears
    in any edge.

    Distributed shape: per-round ``hash_join(edges, labels, on=node)``
    + ``groupby(node).min`` — shuffles are O(|edges|), labels are
    O(|nodes|); the driver only reads the change counter.  Isolated
    nodes (no edges) are the caller's concern."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from raystat.dataops.joins import hash_join

    if isinstance(edges, pd.DataFrame):
        e = edges[["a", "b"]].astype(np.int64)
        edges_ds = rd.from_pandas(e)
    else:
        edges_ds = edges

    def symmetrize(batch: pa.Table) -> pa.Table:
        # both directions PLUS self-loops: the self-loop makes every
        # node its own propagation candidate, so each round is a single
        # join + groupby-min with no union of mixed-lineage datasets
        # (Ray Data unions of pandas- and arrow-block streams are
        # fragile under groupby).
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b, a, b])),
                "nbr": pa.array(np.concatenate([b, a, a, b])),
            }
        )

    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "label": batch["node"]})

    labels = (
        sym.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    for _ in range(max_rounds):
        # neighbor labels: edges joined to labels on the NEIGHBOR side
        def nbr_key(batch: pa.Table) -> pa.Table:
            return pa.table({"cand_of": batch["node"], "node": batch["nbr"]})

        nbr = sym.map_batches(nbr_key, batch_format="pyarrow")
        prop = hash_join(nbr, labels, on="node", n_parts=n_parts)

        def as_candidate(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": pa.array(
                        batch["cand_of"].to_numpy(zero_copy_only=False).astype(
                            np.int64
                        )
                    ),
                    "label": pa.array(
                        batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                    ),
                }
            )

        new_labels = (
            prop.map_batches(as_candidate, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # converged?  DISTRIBUTED change count: join old/new label
        # tables on node and count disagreements — the driver reads one
        # integer, never the label table.
        def rename_old(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch["node"], "old_label": batch["label"]})

        joined = hash_join(
            new_labels,
            labels.map_batches(rename_old, batch_format="pyarrow"),
            on="node",
            n_parts=n_parts,
        )

        def count_changed(batch: pa.Table) -> pa.Table:
            a = batch["label"].to_numpy(zero_copy_only=False)
            b = batch["old_label"].to_numpy(zero_copy_only=False)
            return pa.table({"changed": pa.array([int((a != b).sum())], pa.int64())})

        changed = sum(
            r["changed"]
            for r in joined.map_batches(
                count_changed, batch_format="pyarrow"
            ).take_all()
        )
        labels = new_labels
        if changed == 0:
            break

    out = labels.to_pandas().rename(columns={"label": "component"})
    # the join's null-padded union can float-ify int columns upstream;
    # labels are node ids, pin them back to int64
    out["node"] = out["node"].astype(np.int64)
    out["component"] = out["component"].astype(np.int64)
    return out.sort_values("node", ignore_index=True)
