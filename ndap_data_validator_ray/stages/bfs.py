"""Distributed multi-source BFS hop distances over an edge Dataset.

The graph-proximity primitive next to components (stages/cc.py), PageRank
and k-core: given an undirected edge list and a set of source nodes,
label every node with its hop distance to the NEAREST source — the
building block behind label propagation from seed sets (spam/quality
seeds on a web graph, trusted-domain distance for crawl curation) and
bounded-radius neighborhood queries.

Algorithm: synchronized Bellman-Ford relaxation with unit weights for a
FIXED number of rounds (``rounds`` = the radius of interest).  Fixed
rounds make the result deterministic and SQL-twinnable (an unrolled
min-join CTE per round, the kcore-oracle pattern); nodes not reached
within the budget come back as -1 ("farther than ``rounds`` hops"),
which is the semantics a curation filter actually wants (keep documents
within k hops of a seed) rather than exact eccentricity.

Per round, ONE bucketed exchange (the cc.py fused-gather shape): edge
rows (k=u, val=v) and distance rows (k=node, val=dist) ride the same
exchange bucketed on k; each reducer builds the bucket-local dist lut
and emits a proposal ``(v, dist(u) + 1)`` for every edge whose tail is
currently reached.  Proposals union the standing distances into a
bucketed min-per-node fold.  Labels are settled (repartition +
materialize) between rounds — the round-4 lesson: unioned mapped views
double the block count per round and wall time grows geometrically
without the pin.

Scale notes: every exchanged row is a homogeneous (k, val, side, bucket)
int64 tuple (the cc.py dtype contract — no typed-null padding can upcast
ids); unreached nodes carry the INF sentinel but propose nothing, so the
proposal volume per round is O(edges touching the reached set), not
O(E x rounds) on a sparse frontier graph.  Nothing graph-sized ever
reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ndap_data_validator_ray.stages.groupby import default_n_buckets, stable_bucket

_B = "_bfs_bucket"
_COLS = ["k", "val", "side", _B]

# Unreached sentinel: far above any real hop count, far below int64
# overflow even after += rounds increments.
INF_HOPS = np.int64(1) << 40


def _min_dist_by_node(parts: "ray.data.Dataset", n_buckets: int) -> "ray.data.Dataset":
    """(node, dist) rows -> min dist per node, bucketed two-phase."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("node", as_index=False)["dist"].min()
        return g.assign(**{_B: stable_bucket(g["node"], n_buckets)})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop(columns=[_B]).groupby("node", as_index=False)["dist"].min()

    return parts.map_batches(partial, batch_format="pandas").groupby(_B).map_groups(
        merge, batch_format="pandas"
    )


def _relax_round(
    sym: "ray.data.Dataset", dists: "ray.data.Dataset", n_buckets: int
) -> "ray.data.Dataset":
    """One relaxation round as one lazy chain ending in the min fold."""

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        k = b["u"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "val": b["v"].to_numpy(np.int64),
                "side": np.zeros(len(k), dtype=np.int64),
                _B: stable_bucket(pd.Series(k), n_buckets),
            }
        )[_COLS]

    def tag_dists(b: pd.DataFrame) -> pd.DataFrame:
        k = b["node"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "val": b["dist"].to_numpy(np.int64),
                "side": np.ones(len(k), dtype=np.int64),
                _B: stable_bucket(pd.Series(k), n_buckets),
            }
        )[_COLS]

    tagged = sym.map_batches(tag_edges, batch_format="pandas").union(
        dists.map_batches(tag_dists, batch_format="pandas")
    )

    def reduce(group: pd.DataFrame) -> pd.DataFrame:
        lut = group.loc[group["side"] == 1].set_index("k")["val"]
        ef = group[group["side"] == 0]
        if ef.empty:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=np.int64), "dist": pd.Series([], dtype=np.int64)}
            )
        d = ef["k"].map(lut)
        keep = (d.notna() & (d < INF_HOPS)).to_numpy()
        return pd.DataFrame(
            {
                "node": ef["val"].to_numpy()[keep],
                "dist": (d[keep].astype(np.int64) + 1).to_numpy(),
            }
        )

    proposals = tagged.groupby(_B).map_groups(reduce, batch_format="pandas")
    return _min_dist_by_node(proposals.union(dists), n_buckets)


def distributed_bfs_hops(
    edges: "ray.data.Dataset",
    sources: "ray.data.Dataset",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    source_col: str = "node",
    rounds: int = 4,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Hop distance (0..``rounds``, else -1) from every edge-endpoint node
    to its nearest source.

    ``sources``: Dataset with a ``source_col`` column of source node ids
    (need not be endpoint nodes; sources outside the graph simply label
    themselves 0).  Membership is never tested — source rows seed dist=0,
    endpoint rows seed dist=INF, and the first min fold merges them, so
    the source set can itself be arbitrarily large (no broadcast, no
    driver set).

    ``n_buckets`` defaults adaptively from the symmetric edge count
    (~100k rows per bucket, floor 8, cap ``default_n_buckets()``) — the
    cc.py lesson: cluster-sized fan-out on a toy graph spends the whole
    round on task overhead.

    Node ids must be int64.  Returns (node, hops).
    """
    sym = edges.map_batches(
        lambda b: pd.DataFrame(
            {
                "u": np.concatenate(
                    [b[src_col].to_numpy().astype(np.int64), b[dst_col].to_numpy().astype(np.int64)]
                ),
                "v": np.concatenate(
                    [b[dst_col].to_numpy().astype(np.int64), b[src_col].to_numpy().astype(np.int64)]
                ),
            }
        ),
        batch_format="pandas",
    ).materialize()
    n_sym = sym.count()
    nb = n_buckets or int(min(default_n_buckets(), max(8, n_sym // 100_000 + 8)))

    seeds = sym.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": (u := np.unique(b["u"].to_numpy(np.int64))),
                "dist": np.full(len(u), INF_HOPS, dtype=np.int64),
            }
        ),
        batch_format="pandas",
    ).union(
        sources.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": (s := b[source_col].to_numpy().astype(np.int64)),
                    "dist": np.zeros(len(s), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
    )

    def settle(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        return ds.repartition(min(nb, 32)).materialize()

    dists = settle(_min_dist_by_node(seeds, nb))
    for _round in range(rounds):
        dists = settle(_relax_round(sym, dists, nb))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        d = b["dist"].to_numpy(np.int64)
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "hops": np.where(d >= INF_HOPS, -1, d)}
        )

    return dists.map_batches(finish, batch_format="pandas")
