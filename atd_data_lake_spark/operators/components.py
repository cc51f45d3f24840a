"""Connected components over near-duplicate candidate pairs.

Beyond-reference extension (BASELINE.json north star): pair lists from
MinHash/SimHash/Jaccard/embedding dedup are only actionable once grouped
— a cluster keeps ONE canonical document.  Components are computed by
min-label propagation (each node repeatedly takes the minimum label in
its neighborhood), the standard distributed formulation: every iteration
is one equi-join + one min-aggregation, converging in graph-diameter
iterations.  Near-dup graphs are unions of small dense cliques, so the
diameter — and the iteration count — is tiny regardless of corpus size.

Determinism: the fixpoint (min node id per component) is unique and
independent of execution order, so results are stable across runs and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Exact driver-side union-find for a SMALL edge list (the gate in
    ``connected_components`` decides).  Union-by-min-root + path
    compression — O(E α(E)); the result (component = min reachable node
    id) is the identical fixpoint the distributed path converges to."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edges.select(src, dst).collect():
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:  # union by MIN root: component id = min node id
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru

    rows = [(n, find(n)) for n in parent]
    id_type = dict(edges.dtypes)[src]
    return edges.sparkSession.createDataFrame(
        rows, f"node {id_type}, component {id_type}"
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    max_local_edges: int = 2_000_000,
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = min node
    id reachable.  Nodes appear iff they occur in an edge (isolated
    documents are trivially their own component — no work to do).

    Each round does two label-shrinking steps (the hook+shortcut scheme of
    Shiloach–Vishkin / the star-contraction family):

    1. *hook* — every node takes the minimum label in its neighborhood
       (one equi-join + min-aggregation);
    2. *shortcut (pointer jumping)* — every node replaces its label with
       its label's label (one self-join), so label-pointer chains halve.

    Shortcutting is what turns O(diameter) convergence into O(log n):
    a pure-propagation pass moves the minimum one hop per round, while a
    hooked+shortcut pass doubles the distance already covered — a
    1000-node chain converges in ~10 rounds, not ~1000.

    Each iteration ``localCheckpoint``s its label frame: iterative
    DataFrame algorithms grow their logical plan by one join per round,
    and without truncation the analysis/recompute cost compounds (on a
    cluster, swap in reliable ``checkpoint`` with a checkpoint dir).
    Convergence is detected by the label-sum invariant (labels only
    decrease, so an unchanged sum is a fixpoint — one scalar action per
    iteration, no join-and-compare).

    Raises ``RuntimeError`` if the fixpoint is not reached in ``max_iter``
    rounds — returning silently would hand back wrong (split) components.
    With shortcutting, 25 rounds covers any graph that fits on disk.

    Size gate (the ``embedding_near_dups`` pattern): the edge list is a
    dedup CANDIDATE output — proportional to near-duplicates, orders of
    magnitude below the corpus — so it is often small even when the
    corpus is 100 TB.  At or below ``max_local_edges`` the exact
    union-find runs on the driver (O(E α) — a multi-round distributed
    fixpoint on kilobyte data pays ~10 job latencies for nothing); above
    it, the distributed hook+shortcut path runs and the edges never
    reach the driver.  Both paths compute the same unique fixpoint.
    """
    # persist: the gate's count() and the chosen path both reuse the
    # (possibly expensive to recompute) pair source
    edges = edges.persist()
    try:
        if edges.count() <= max_local_edges:
            return _local_components(edges, src, dst)
        return _distributed_components(edges, src, dst, max_iter)
    finally:
        edges.unpersist()


def _distributed_components(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    # symmetrize once and persist: every iteration reuses the edge frame
    # instead of recomputing it from the (possibly expensive) pair source
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # hook: min label over the neighborhood
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        hooked = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            # both sides of the shortcut self-join read this frame —
            # checkpoint so the hook join runs once, not twice
            .localCheckpoint(eager=True)
        )
        # shortcut: lbl(u) ← lbl(lbl(u)) — labels only decrease, so the
        # looked-up label is always ≤ the current one when present
        ptr = hooked.select(
            F.col("node").alias("_pn"), F.col("lbl").alias("_pl")
        )
        labels = (
            hooked.join(ptr, hooked["lbl"] == ptr["_pn"], "left")
            .select(
                "node",
                F.coalesce(F.col("_pl"), F.col("lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            f"labels are still shrinking — raise max_iter (O(log n) rounds "
            f"suffice with shortcutting, so this indicates a pathological "
            f"input or too small a bound)"
        )
    return labels.select("node", F.col("lbl").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pair list → per-document cluster assignment:
    (doc_id, component, n_members).  The canonical document of a cluster
    is its component id (the minimum doc id); everything else in the
    cluster is droppable."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count("*").alias("n_members"))
    return (
        comp.join(F.broadcast(sizes), "component")
        .select(F.col("node").alias("doc_id"), "component", "n_members")
    )
