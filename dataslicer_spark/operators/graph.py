"""Generic distributed connected components over an edge DataFrame.

The training-data dedup pipeline needs the step AFTER near-dup pair
mining (``dedup.py``): pairs form a similarity graph, every connected
component is one duplicate group, and the group's canonical document is
the one that survives.  The reference has no analogue (its dedup is
pandas ``drop_duplicates``); this is the set-based Spark formulation.

Algorithm: min-label propagation with pointer jumping, the same
construction the DBSCAN merge fallback uses (``clustering.py``,
``_merge_map_distributed``) but over arbitrary vertex ids instead of
cell-label strings.  Each round every node takes the min representative
over {itself} ∪ neighbors, then shortcuts ``rep ← rep(rep)`` — the
pointer jump halves chain lengths, so rounds are O(log diameter), each a
plain hash shuffle on the node id.  No driver collect at any point; the
growing plan lineage is truncated per-round with ``localCheckpoint``.
At the fixed point every node carries its component's smallest id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    mode: str = "auto",
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """(node, rep) for every vertex in ``edges``; ``rep`` is the smallest
    vertex id (by the column's natural ordering) in the node's component.

    Vertices appear only via edges — isolated vertices (no pair) are the
    caller's concern (they are their own representative by definition).

    ``mode``: ``'driver'`` collects the (deduplicated, bidirectional)
    edge list into a driver union-find — one action, no propagation
    rounds; ``'distributed'`` always runs iterative min-label propagation;
    ``'auto'`` (default) probes with a bounded ``limit()`` collect and
    takes the driver path when the edge count is ≤ ``driver_max_edges``
    (≈16 MB of long pairs at the default — trivial driver memory), else
    falls back to the distributed rounds.  Both paths produce identical
    labels (rep = smallest id in the component).  The same dual-path
    rationale as the DBSCAN merge (clustering.py): near-dup graphs are
    orders of magnitude smaller than the corpus, so the driver path is
    the common case even at large corpus scale, while the distributed
    path removes the unbounded collect for adversarial graphs.
    """
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(
            f"mode must be 'auto', 'driver' or 'distributed', got {mode!r}"
        )
    nbrs = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # truncate the (possibly expensive) edge-mining lineage once:
        # every propagation round joins nbrs twice, and without this the
        # full upstream plan would re-execute each round
        .localCheckpoint()
    )
    if mode != "distributed":
        # nbrs holds BOTH directions of every undirected edge, so the
        # probe budget is 2× the documented edge cap
        cap = 2 * driver_max_edges
        rows = (
            nbrs.collect()
            if mode == "driver"
            else nbrs.limit(cap + 1).collect()
        )
        if mode == "driver" or len(rows) <= cap:
            parent: dict = {}

            def find(k):
                root = k
                while parent.setdefault(root, root) != root:
                    root = parent[root]
                while parent[k] != root:
                    parent[k], k = root, parent[k]
                return root

            for r in rows:
                a, b = find(r.u), find(r.v)
                if a != b:
                    lo, hi = (a, b) if a < b else (b, a)
                    parent[hi] = lo
            mapping = [(n, find(n)) for n in parent]
            spark = edges.sparkSession
            node_type = nbrs.schema["u"].dataType
            schema = T.StructType(
                [
                    T.StructField("node", node_type),
                    T.StructField("rep", node_type),
                ]
            )
            return spark.createDataFrame(mapping, schema)
    labels = (
        nbrs.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("rep", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            nbrs.join(labels, nbrs.v == labels.node)
            .groupBy("u")
            .agg(F.min("rep").alias("nrep"))
        )
        # carry the pre-round rep as `old` so convergence detection is a
        # filter over the checkpointed result, not another join
        stepped = labels.join(nbr_min, labels.node == nbr_min.u, "left").select(
            labels.node,
            labels.rep.alias("old"),
            F.least(labels.rep, F.coalesce(F.col("nrep"), labels.rep)).alias(
                "rep"
            ),
        )
        ptr = stepped.select(
            F.col("node").alias("pnode"), F.col("rep").alias("prep")
        )
        jumped = (
            stepped.join(ptr, stepped.rep == ptr.pnode, "left")
            .select(
                stepped.node,
                F.col("old"),
                F.least(
                    stepped.rep, F.coalesce(F.col("prep"), stepped.rep)
                ).alias("rep"),
            )
            .localCheckpoint()
        )
        changed = jumped.filter(F.col("rep") != F.col("old")).limit(1).count()
        labels = jumped.drop("old")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-point integer PageRank — the iterative JOIN-shaped
    computation (per round: ranks ⋈ edges on src, re-aggregate on dst),
    deterministic enough to carry a SQL oracle.

    Why integer: float PageRank sums are partitioning-dependent, so no
    external engine can replay them exactly.  Here ranks are int64 in a
    ``scale`` fixed-point: every node starts at ``scale // n``; each
    round a node keeps the teleport base ``(scale·(1−d)) // n`` and
    receives ``((r_u·d_num)//d_den)//outdeg(u)`` from each in-neighbor —
    all exact floor divisions (operands are non-negative, so Spark,
    DuckDB and Python integer division agree).  Floor dust and
    dangling-node mass (out-degree 0) simply evaporate: total mass is
    not conserved to the last unit, but every engine loses the exact
    same units — determinism is the contract, the ranking is standard
    PageRank (Page et al., 1999) to within the quantization.

    Scale shape: the canonical distributed PageRank — per iteration one
    shuffle of ranks on the join key and one of contributions on the
    destination; state stays fully distributed (no driver collect, the
    whole n-iteration computation is ONE lazy plan).  Multi-edges are
    collapsed (DISTINCT) so out-degree has graph semantics.

    Returns (node, rank) for every node appearing as src or dst.
    """
    d_num, d_den = damping
    # the floor divisions run as (x − x mod y)/y with the division in
    # doubles; that stays EXACT only while rank·d_num < 2^53 — guard the
    # public parameter so a large scale cannot silently lose units
    if scale * d_num >= 2**53:
        raise ValueError(
            f"scale·damping numerator {scale * d_num} ≥ 2^53 would break "
            "exact floor division — use scale ≤ ~1e14"
        )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).filter(F.col(src).isNotNull() & F.col(dst).isNotNull()).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # materialize the prepared graph ONCE (localCheckpoint, like
    # connected_components): every iteration references it, and a lazy
    # plan would re-run the upstream edge derivation per reference —
    # measured 7.9 s → 2 s at sf0.1 for the 3-iteration plan
    ed = e.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)

    n = nodes.count()  # one bounded scalar to size the teleport base
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    r0 = scale // n
    base = (scale * (d_den - d_num) // d_den) // n

    ranks = nodes.withColumn("rank", F.lit(r0).cast("long"))
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .withColumn(
                "__sh",
                ((F.col("rank") * d_num
                  - F.pmod(F.col("rank") * d_num, F.lit(d_den)))
                 / d_den).cast("long"),
            )
            .withColumn(
                "__c",
                ((F.col("__sh") - F.pmod(F.col("__sh"), F.col("deg")))
                 / F.col("deg")).cast("long"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("__in"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks
