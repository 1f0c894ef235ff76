"""Multi-field indexing: field-scoped queries + per-field boosts.

A code-search user queries ``path:util parse`` — some clauses scoped to a
metadata field, the rest against the default content field. Lucene models
this as one index with field-prefixed terms; the Spark-native shape here
is one SUB-INDEX per field (``<out>/field=<col>/`` — each a complete,
independently usable index built by the unchanged ``build_index``), all
sharing the same doc_id space. This buys:

- per-field statistics for free (df/avgdl are naturally per-field — the
  BM25F-lite requirement — because each sub-index computes its own);
- total layout isolation: a content-only query never reads path postings
  (a different directory, not just a different column);
- build/merge/compact/delete reuse verbatim per field.

Scoring: score(q, d) = Σ_field boost_f · BM25_f(q_f, d) — each field's
disjunctive BM25 over the clauses scoped to it, weighted and summed, then
one global top-k window (round-9 key, doc_id tiebreak — the engine-wide
ranking contract). This is Lucene's multi-field BooleanQuery semantics
(per-field idf), not the single-merged-statistics BM25F variant — the
difference is documented, and the oracle implements the same formula.

Query syntax: whitespace-split; a clause ``f:rest`` with ``f`` a known
field routes to that field, anything else goes to ``default_field``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dts.index_build import build_index, load_meta
from dts.score_index import (
    ROUND_RANK,
    TOPK_SCHEMA,
    bm25_shard_candidates,
    bm25_topk_indexed,
    scoring_shards,
    topk_merge_global,
)


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    fields: dict[str, float],
    **build_kwargs,
) -> dict:
    """One sub-index per field column at ``<out>/field=<col>``; ``fields``
    maps doc column → boost. ``docs`` needs doc_id + the field columns.
    Returns the multifield meta (also persisted as ``<out>/meta.json``)."""
    for col in fields:
        build_index(
            spark,
            docs.select("doc_id", F.col(col).alias("content")),
            f"{out_dir}/field={col}",
            **build_kwargs,
        )
    meta = {"fields": {c: float(b) for c, b in fields.items()}}
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return meta


def parse_field_query(
    text: str, fields: dict[str, float], default_field: str
) -> dict[str, str]:
    """field → sub-query text. ``f:rest`` clauses route to field f (when
    known); everything else concatenates onto the default field."""
    out: dict[str, list[str]] = {}
    for clause in (text or "").split():
        field, sep, rest = clause.partition(":")
        if sep and field in fields and rest:
            out.setdefault(field, []).append(rest)
        else:
            out.setdefault(default_field, []).append(clause)
    return {f: " ".join(parts) for f, parts in out.items()}


def load_multifield_meta(out_dir: str) -> dict:
    with open(f"{out_dir}/meta.json") as f:
        return json.load(f)


def bm25_topk_multifield(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    k: int = 10,
    strategy: str = "taat",
    default_field: str | None = None,
    distribute: str | None = None,
) -> DataFrame:
    """Top-k over a multifield index. ``queries`` needs (query_id, text
    [, fuzzy_k]); clause routing per ``parse_field_query``. Returns the
    engine-standard (query_id, doc_id, score, rank).

    ``distribute`` (round-4 verdict fix — the old implementation pushed
    EVERY candidate of every field through one global window partition per
    query, a single-task sort at head-term scale):

    - ``"bucket"`` (default on many-bucket indexes): sub-indexes share
      doc_ids AND bucket boundaries, so a document's entire multi-field
      score lives in ONE bucket shard across all fields. Per field,
      ``bm25_shard_candidates`` emits full per-(query, shard) candidate
      scores with an IDENTICAL shard mapping; the weighted union-sum is
      then grouped per (query, shard, doc), local top-k runs per
      (query, shard) — every window partition bounded by the shard's doc
      range — and ``topk_merge_global`` ranks the k×shards survivors.
      Exact: local top-k under the global ranking key restricted to
      disjoint shards can never drop a global top-k doc.
    - ``"query"``: the small-index path — per-field full candidates merged
      through one window per query (fine when the index itself is small).
    - ``None``: bucket when the sub-indexes have ≥32 buckets, else query
      (same shape as auto_distribute: shards only pay off when groups are
      big enough to amortize).

    Both paths are rank-identical (tested)."""
    meta = load_multifield_meta(out_dir)
    fields: dict[str, float] = meta["fields"]
    if default_field is None:
        default_field = (
            "content" if "content" in fields else next(iter(sorted(fields)))
        )
    has_fk = "fuzzy_k" in queries.columns
    rows = queries.select(
        "query_id", "text", *(["fuzzy_k"] if has_fk else [])
    ).collect()
    per_field: dict[str, list[tuple[int, str, int]]] = {}
    for r in rows:
        fk = int(r["fuzzy_k"] or 0) if has_fk else 0
        for f_name, sub in parse_field_query(
            r["text"], fields, default_field
        ).items():
            per_field.setdefault(f_name, []).append(
                (int(r["query_id"]), sub, fk)
            )
    if not per_field:
        return spark.createDataFrame([], TOPK_SCHEMA)

    sub_metas = {
        f_name: load_meta(f"{out_dir}/field={f_name}") for f_name in per_field
    }
    bucket_sizes = {m["bucket_size"] for m in sub_metas.values()}
    assert len(bucket_sizes) == 1, (
        f"multifield sub-indexes disagree on bucket_size: {bucket_sizes} — "
        "the shared shard mapping requires one bucket geometry"
    )
    any_meta = next(iter(sub_metas.values()))
    n_buckets = -(-any_meta["n_docs"] // any_meta["bucket_size"])
    if distribute is None:
        distribute = "bucket" if n_buckets >= 32 else "query"

    if distribute == "bucket":
        n_shards = scoring_shards(
            any_meta, spark.sparkContext.defaultParallelism
        )
        cands = []
        for f_name, qrows in sorted(per_field.items()):
            sub_q = spark.createDataFrame(
                qrows, "query_id long, text string, fuzzy_k int"
            )
            c = bm25_shard_candidates(
                spark, f"{out_dir}/field={f_name}", sub_q, n_shards,
                strategy=strategy,
            )
            cands.append(
                c.select(
                    "query_id", "shard", "doc_id",
                    (F.col("score") * F.lit(fields[f_name])).alias("score"),
                )
            )
        union = cands[0]
        for c in cands[1:]:
            union = union.unionByName(c)
        # Weighted cross-field sum per doc — a hash agg (map-side combined,
        # group = one doc), NOT a window; then local top-k per bounded
        # (query, shard) partition.
        total = union.groupBy("query_id", "shard", "doc_id").agg(
            F.sum("score").alias("score")
        )
        w_local = Window.partitionBy("query_id", "shard").orderBy(
            F.round(F.col("score"), ROUND_RANK).desc(), F.col("doc_id").asc()
        )
        local = (
            total.withColumn("r", F.row_number().over(w_local))
            .filter(F.col("r") <= k)
            .select("query_id", "doc_id", "score")
        )
        return topk_merge_global(local, k).select(
            "query_id", "doc_id", "score",
            F.col("rank").cast("int").alias("rank"),
        )

    scored = []
    for f_name, qrows in sorted(per_field.items()):
        sub_q = spark.createDataFrame(
            qrows, "query_id long, text string, fuzzy_k int"
        )
        s = bm25_topk_indexed(
            spark, f"{out_dir}/field={f_name}", sub_q, k=2**62,
            strategy=strategy,
        )
        scored.append(
            s.select(
                "query_id", "doc_id",
                (F.col("score") * F.lit(fields[f_name])).alias("score"),
            )
        )
    union = scored[0]
    for s in scored[1:]:
        union = union.unionByName(s)
    total = union.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), ROUND_RANK).desc(), F.col("doc_id").asc()
    )
    return (
        total.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("int").alias("rank"))
    )
