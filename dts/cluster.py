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
- for adversarial graphs (long chains) the large-star/small-star variant
  halves the round count — documented as the upgrade path, not needed
  for near-clique duplicate clusters.
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


def dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_id): shingle-Jaccard near-duplicate clusters —
    jaccard_pairs composed with connected_components. Docs in no pair
    (unique docs) are omitted; a keep-one policy keeps cluster_id == doc_id
    rows plus every omitted doc."""
    from dts.dedup import jaccard_pairs

    pairs = jaccard_pairs(
        docs, text_col=text_col, n=n, threshold=threshold,
        max_shingle_df=max_shingle_df,
    )
    return connected_components(pairs)
