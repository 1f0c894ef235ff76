"""Near-duplicate clustering: connected components over similarity pairs.

The dedup modules emit PAIRS (jaccard_pairs, lsh_candidate_pairs,
embedding_dup_pairs); a deletion/keep-one policy needs CLUSTERS. This is
the min-label-propagation connected-components algorithm on DataFrames:
every node repeatedly adopts the minimum label among itself and its
neighbours until fixpoint — the classic iterative-algorithm shape on
Spark (each round is one shuffle-join; convergence in O(diameter) rounds,
and duplicate clusters are near-cliques, so 2-3 rounds in practice).

Scale notes:
- lineage is truncated every round with ``localCheckpoint`` — without it
  the join-upon-join plan grows exponentially and the optimizer chokes
  long before the data does;
- the convergence check is one count per round (changed-label rows);
- for adversarial graphs (long chains, high diameter) min-label needs
  O(diameter) rounds; ``connected_components_star`` (round 4) implements
  the large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond"), which converges in O(log² n)
  rounds on ANY graph shape — the demonstrated case: a 60-node chain that
  blows min-label's round budget finishes in a handful of star rounds.
  Duplicate clusters are near-cliques, so min-label (fewer shuffles per
  round) stays the default; ``dup_clusters(algorithm="star")`` switches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for every node appearing in ``pairs``;
    cluster_id = the minimum doc_id reachable from the node (a canonical,
    deterministic representative — the same convention as
    dedup.exact_canonical). Raises if not converged in ``max_iter``."""
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nl"))
        )
        new_labels = (
            labels.join(
                nbr_min.select(F.col("src").alias("node"), "nl"),
                "node",
                "left",
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nl", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the round budget; raise max_iter or "
        "switch to the large-star/small-star variant"
    )


def connected_components_star(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.) —
    O(log² n) rounds on ANY graph, the adversarial-shape upgrade over
    min-label propagation's O(diameter). Same output contract as
    ``connected_components``: (doc_id, cluster_id) with cluster_id = the
    component's minimum doc_id.

    Per round: LARGE-STAR connects every neighbor larger than u to
    m(u) = min(N(u) ∪ {u}); SMALL-STAR connects the smaller neighbors
    (and u) to m(u). Both preserve connectivity and strictly flatten the
    structure until every component is a star rooted at its minimum.
    Each op is one shuffle (groupBy min + join); the fixpoint check is a
    symmetric edge-set difference."""

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    def _mins(sym: DataFrame) -> DataFrame:
        return sym.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("m")
        )

    raw = pairs.select(
        F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v")
    )
    # Node universe BEFORE dropping self-loops: a (x, x) pair still names
    # x as a (singleton) cluster member — min-label parity.
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = raw.filter(F.col("u") != F.col("v"))
    edges = e.distinct().localCheckpoint()
    if edges.isEmpty():
        return all_nodes.select(
            F.col("node").alias("doc_id"), F.col("node").alias("cluster_id")
        )
    for _ in range(max_iter):
        sym = _sym(edges)
        m = _mins(sym)
        # large-star: bigger neighbors attach to the local minimum
        big = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        edges_l = (
            big.unionByName(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        sym2 = _sym(edges_l)
        m2 = _mins(sym2)
        # small-star: smaller neighbors (and u itself) attach to the min
        small = (
            sym2.filter(F.col("v") < F.col("u"))
            .join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        new_edges = (
            small.unionByName(m2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # Single-job fixpoint check (round-5 verdict #9): both edge sets
        # are distinct, so the symmetric difference is the null-padded
        # rows of one full outer join — one action per round instead of
        # two exceptAll jobs.
        changed = (
            new_edges.withColumn("_n", F.lit(1))
            .join(
                edges.withColumn("_o", F.lit(1)), ["u", "v"], "full_outer"
            )
            .filter(F.col("_n").isNull() | F.col("_o").isNull())
            .count()
        )
        edges = new_edges
        if changed == 0:
            # fixpoint: every edge is (node, component-min); self-loop-only
            # nodes come back as singletons via the node universe.
            labels = _mins(_sym(edges)).select(
                F.col("u").alias("node"), F.col("m").alias("label")
            )
            return (
                all_nodes.join(labels, "node", "left")
                .select(
                    F.col("node").alias("doc_id"),
                    F.coalesce("label", F.col("node")).alias("cluster_id"),
                )
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    algorithm: str = "label",
) -> DataFrame:
    """(doc_id, cluster_id): shingle-Jaccard near-duplicate clusters —
    jaccard_pairs composed with connected components. Docs in no pair
    (unique docs) are omitted; a keep-one policy keeps cluster_id == doc_id
    rows plus every omitted doc. ``algorithm``: "label" (min-label
    propagation, default — duplicate graphs are near-cliques) or "star"
    (large-star/small-star, for adversarial high-diameter graphs)."""
    from dts.dedup import jaccard_pairs

    pairs = jaccard_pairs(
        docs, text_col=text_col, n=n, threshold=threshold,
        max_shingle_df=max_shingle_df,
    )
    if algorithm == "star":
        return connected_components_star(pairs)
    return connected_components(pairs)
