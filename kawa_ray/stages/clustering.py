"""S6 — transitive closure: union-find (driver) + distributed min-label
propagation (scale path).

Edge count is orders of magnitude below the corpus size (edges live in
the distinct-surface space), so the default is an exact driver-side
union-find over the streamed edge set — the same trade the reference's
builder makes with its incremental synonym-cluster merging
(/root/reference/ontology/ontology_builder.py:164-174).  The scale path
is alternating min-label propagation over ``groupby(node)`` rounds to a
fixed point — the standard hash-to-min connected components; both paths
are tested for identical component sets.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self):
        self.parent: dict = {}
        self.rank: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            self.rank[x] = 0
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1


def union_find_components(edges: Iterable[tuple[str, str]],
                          nodes: Iterable[str] = ()) -> dict[str, str]:
    """node -> component id (the lexicographically smallest member)."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    for n in nodes:
        uf.find(n)
    # canonical component label = min member, deterministic across runs
    members: dict = {}
    for x in list(uf.parent):
        members.setdefault(uf.find(x), []).append(x)
    out: dict[str, str] = {}
    for _, mem in members.items():
        label = min(mem)
        for x in mem:
            out[x] = label
    return out


def label_propagation_components(edges_ds, max_rounds: int = 20):
    """Distributed connected components: hash-to-min label propagation
    with DRIVER-SIDE PATH COMPRESSION between rounds.

    ``edges_ds``: Dataset with string cols (a, b).  Returns a Dataset
    (node, component).  Each round: explode edges both directions,
    broadcast-relabel, hash-partition by node + in-batch groupby-min ->
    new labels; then, since this tier already holds the label dict on
    the driver, chase label chains to their roots (labels decrease
    monotonically toward each component's min, so every chain
    terminates) — the compression step that turns O(diameter) rounds
    into a handful (a 16x-corpus blocking graph whose chained prefix
    blocks exhausted 20 raw rounds — returning a WRONG histogram
    before the exhaustion raise existed — converges well inside the
    limit with compression; measured, blocking_ops cluster census).
    Stop when no compressed label changed; RAISE on
    max_rounds exhaustion rather than return partially-propagated
    labels.  This is the MID-SIZE path (the label table is broadcast
    and downloaded per round, so node space must fit a worker); the
    bucketed variant below is the scale path.  The min-merge shuffles
    on a hash PARTITION of the node, never per distinct node
    (~1.5-2 ms/key dispatch, the stages/distinct.py rule).
    """
    import pyarrow as pa
    import ray

    from kawa_ray.stages.distinct import partition_distinct, route_parts

    P = 64
    edges = edges_ds.select_columns(["a", "b"]).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [batch.column("b").combine_chunks(), batch.column("a").combine_chunks()]
                ),
            }
        )

    def _compress(lab: dict) -> dict:
        # chase chains to the root (lab[r] == r); memoize along the way.
        # Labels strictly decrease along a chain, so termination is
        # guaranteed, and every label value is itself a node key.
        for v in list(lab):
            r = v
            seen = []
            while lab[r] != r:
                seen.append(r)
                r = lab[r]
            for s in seen:
                lab[s] = r
        return lab

    # labels start as the node's own name; each round a node adopts the min
    # of (its label, neighbours' labels)
    _ldf = partition_distinct(
        edges.map_batches(explode, batch_format="pyarrow")
        .map_batches(lambda t: pa.table({"node": t.column("node")}),
                     batch_format="pyarrow"),
        ["node"], key_col="node", partitions=P,
        then=lambda g: g[["node"]].assign(label=g["node"]),
    ).to_pandas()  # to_pandas, not take_all (per-row dict cost)
    lab = dict(zip(_ldf["node"], _ldf["label"]))
    for _ in range(max_rounds):
        # join edge endpoints with current labels (broadcast: label table is
        # node-space sized; at true scale this becomes a bucketed join)
        lab_ref = ray.put(lab)

        def relabel(batch: pa.Table, _ref=lab_ref) -> pa.Table:
            l = ray.get(_ref)
            node = batch.column("node").to_pylist()
            nbr = batch.column("nbr").to_pylist()
            return pa.table(
                {
                    "node": pa.array(node, pa.string()),
                    "cand": pa.array([min(l[n], l[m]) for n, m in zip(node, nbr)], pa.string()),
                    "part": pa.array(route_parts(pd.Series(node, dtype=object), P),
                                     pa.int64()),
                }
            )

        new_labels = (
            edges.map_batches(explode, batch_format="pyarrow")
            .map_batches(relabel, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: (g.groupby("node", sort=False)["cand"].min()
                           .rename("label").reset_index()),
                batch_format="pandas",
            )
            .materialize()
        )
        _ndf = new_labels.to_pandas()
        new_lab = _compress(dict(zip(_ndf["node"], _ndf["label"])))
        if new_lab == lab:
            import ray.data as _rd

            return _rd.from_pandas(pd.DataFrame(
                {"node": list(new_lab), "label": list(new_lab.values())}))
        lab = new_lab
    # exhausting max_rounds means the labels are PARTIALLY propagated —
    # a silently-wrong component table (one real cluster counted as
    # several).  Rounds = O(component diameter), so raise loudly.
    raise RuntimeError(
        f"label propagation did not converge in {max_rounds} rounds; "
        f"the graph's component diameter exceeds max_rounds — raise it")


def label_propagation_components_bucketed(edges_ds, max_rounds: int = 20,
                                          partitions: int = 64):
    """Broadcast-free distributed connected components (hash-to-min).

    Each round is TWO hash-partition shuffles — no driver-held or
    broadcast label table, so it holds at graphs whose node space
    exceeds worker memory (the scale path for S6; the broadcast variant
    above is the mid-size path, driver union-find the small path — all
    three proven equivalent in tests, incl. a seeded random graph):

      1. partition label rows (node, lbl) and edge rows (node, nbr) by
         hash(node) — co-located, so an in-batch pandas groupby tags
         every edge with its node's current label (cost per PARTITION,
         not per node: Ray's map_groups/aggregate pay ~1.5-2 ms per
         distinct key, the stages/distinct.py rule);
      2. partition the emitted (nbr, candidate_label) rows by hash(nbr),
         in-batch groupby-min — hash-to-min propagation.  The node's
         own current label rides along in ``old`` (empty-string
         sentinel on neighbour rows; "" sorts before every string, so
         max() recovers exactly the one self row's label), making the
         convergence check a remote per-batch partial count + scalar
         sum instead of a third label-table shuffle.
    """
    import pandas as pd
    import pyarrow as pa

    from kawa_ray.stages.distinct import partition_distinct

    P = partitions
    edges = edges_ds.select_columns(["a", "b"]).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [batch.column("b").combine_chunks(), batch.column("a").combine_chunks()]
                ),
            }
        )

    adj = edges.map_batches(explode, batch_format="pyarrow").materialize()
    # initial labels: node -> node, via the shared partitioned distinct
    # (node-cardinality keys must never go through per-key aggregates)
    labels = partition_distinct(
        adj.map_batches(lambda t: pa.table({"node": t.column("node")}),
                        batch_format="pyarrow"),
        ["node"], key_col="node", partitions=P,
        then=lambda g: g[["node"]].assign(lbl=g["node"]),
    ).materialize()

    from kawa_ray.stages.distinct import route_parts

    def _part_of(s: pd.Series):
        return route_parts(s, P)

    for _ in range(max_rounds):
        # 1. co-locate each node's label row with its adjacency rows
        lab_rows = labels.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"], "nbr": [None] * len(df),
                 "lbl": df["lbl"], "part": _part_of(df["node"])}
            ),
            batch_format="pandas",
        )
        edge_rows = adj.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"], "nbr": df["nbr"],
                 "lbl": [None] * len(df), "part": _part_of(df["node"])}
            ),
            batch_format="pandas",
        )

        def tag_part(g: pd.DataFrame) -> pd.DataFrame:
            # per-node current label (exactly one label row per node,
            # co-located by the partition hash)
            m = g.dropna(subset=["lbl"]).groupby("node", sort=False)["lbl"].min()
            e = g[g["nbr"].notna()]
            cand = m.reindex(e["node"]).to_numpy()
            return pd.DataFrame(
                {"nbr": e["nbr"].tolist() + m.index.tolist(),
                 "cand": list(cand) + m.tolist(),
                 "old": [""] * len(e) + m.tolist()}
            )

        cands = (
            lab_rows.union(edge_rows)
            .groupby("part")
            .map_groups(tag_part, batch_format="pandas")
        )

        def min_part(g: pd.DataFrame) -> pd.DataFrame:
            agg = (g.groupby("nbr", sort=False)
                   .agg(lbl=("cand", "min"), old=("old", "max"))
                   .reset_index())
            return agg.rename(columns={"nbr": "node"})

        new_labels = (
            cands.map_batches(
                lambda df: df.assign(part=_part_of(df["nbr"])),
                batch_format="pandas")
            .groupby("part")
            .map_groups(min_part, batch_format="pandas")
            .materialize()
        )
        # convergence: remote per-batch partials, one scalar on the driver
        n_changed = new_labels.map_batches(
            lambda df: pd.DataFrame(
                {"c": [int((df["lbl"] != df["old"]).sum())]}),
            batch_format="pandas",
        ).sum("c")
        labels = new_labels.select_columns(["node", "lbl"])
        if not n_changed:
            return labels
    raise RuntimeError(
        f"bucketed label propagation did not converge in {max_rounds} "
        f"rounds; the graph's component diameter exceeds max_rounds — "
        f"raise it")
