"""ES parent-child join queries (``has_child`` / ``has_parent``).

ES models one-to-many relations inside an index with the ``join`` field
and queries them with has_child ("parents having matching children",
optionally scored by an aggregate of child scores) and has_parent
("children whose parent matches"). The Spark-native shape: parents and
children are two DataFrames sharing a key — the query is a semi-join or
an aggregate join, both map onto one shuffle-on-key (or a broadcast when
the matching side is small), exactly the plan a 1000-executor cluster
wants. No global gather, no driver loop.

Scoring contract: the child frame may carry a ``_score`` column (any
upstream scorer of this engine — BM25 top-k output, function_score,
constant); absent, every matching child scores 1.0 (ES constant-score
filter context). ``score_mode`` aggregates child scores per parent the
ES way: none | max | min | avg | sum | count. Cross-engine float safety:
max/min/count are order-free; sum/avg over many children are
order-dependent in IEEE754 — fine inside the engine, but oracle probes
pin the order-free modes (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_MODES = ("none", "max", "min", "avg", "sum", "count")


def _matching(df: DataFrame, pred_sql: str | None) -> DataFrame:
    return df.filter(F.expr(pred_sql)) if pred_sql else df


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_pred_sql: str | None = None,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """Parents having ≥ ``min_children`` (and ≤ ``max_children``) children
    that satisfy ``child_pred_sql``. Returns the parent rows plus
    ``n_children`` and — for score_mode ≠ none — ``_score`` aggregated
    from the children's ``_score`` (1.0 each when absent).

    Plan: filter children (predicate pushdown reaches the child scan) →
    ONE partial+final hash agg per parent key → join back to parents on
    the key. The agg bounds the shuffle by distinct parent keys, never by
    child count."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    kids = _matching(children, child_pred_sql)
    score_col = (
        F.col("_score") if "_score" in kids.columns else F.lit(1.0)
    )
    aggs = [F.count("*").alias("n_children")]
    if score_mode in ("max", "min", "avg", "sum"):
        aggs.append(
            getattr(F, score_mode)(score_col).alias("_score")
        )
    elif score_mode == "count":
        aggs.append(F.count("*").cast("double").alias("_score"))
    per_parent = (
        kids.select(F.col(child_key).alias(parent_key), score_col.alias("_score"))
        .groupBy(parent_key)
        .agg(*aggs)
        .filter(F.col("n_children") >= min_children)
    )
    if max_children is not None:
        per_parent = per_parent.filter(F.col("n_children") <= max_children)
    return parents.join(per_parent, parent_key)


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    parent_pred_sql: str | None = None,
    with_score: bool = False,
) -> DataFrame:
    """Children whose parent satisfies ``parent_pred_sql`` (ES
    has_parent). With ``with_score`` the parent's ``_score`` (1.0 when
    absent) is attached to every child (ES score=true propagates the
    parent score down). Plan: filter parents → broadcast-or-shuffle
    semi/inner join on the key — the parent side after a selective
    predicate is usually broadcastable and Spark's AQE picks that."""
    ps = _matching(parents, parent_pred_sql)
    if not with_score:
        return children.join(
            ps.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_semi",
        )
    score_col = (
        F.col("_score") if "_score" in ps.columns else F.lit(1.0)
    )
    keyed = ps.select(
        F.col(parent_key).alias(child_key), score_col.alias("_score")
    )
    # ES score=true makes the PARENT's score the child's score — replace
    # any child-side _score rather than emitting a duplicate column.
    kids = (
        children.drop("_score") if "_score" in children.columns else children
    )
    return kids.join(keyed, child_key)


def nested_match(
    docs: DataFrame,
    path: str,
    elem_pred_sql: str,
    score_expr_sql: str | None = None,
    score_mode: str = "none",
) -> DataFrame:
    """ES ``nested`` query: match docs where SOME element of the
    array-of-struct field ``path`` satisfies ``elem_pred_sql`` — the
    predicate references element fields as ``_e.<field>`` and must hold
    on ONE element (the semantics ordinary object mapping loses: with
    flattened fields, `a=1 AND b=2` can match across DIFFERENT elements;
    nested requires the SAME element).

    With ``score_mode`` ≠ none, ``score_expr_sql`` (over ``_e``) scores
    each matching element and the doc's ``_score`` aggregates per ES:
    max | min | avg | sum (avg over MATCHING elements, ES's rule).

    100% JVM expressions — exists()/filter()/aggregate() over the array
    column, one codegen map pass, no explode and no shuffle."""
    if score_mode not in ("none", "max", "min", "avg", "sum"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    exists = F.expr(f"exists({path}, _e -> {elem_pred_sql})")
    matched = docs.filter(exists)
    if score_mode == "none":
        return matched
    if score_expr_sql is None:
        raise ValueError("score_expr_sql required when score_mode != none")
    scores = (
        f"transform(filter({path}, _e -> {elem_pred_sql}), "
        f"_e -> cast(({score_expr_sql}) as double))"
    )
    agg = {
        "max": f"array_max({scores})",
        "min": f"array_min({scores})",
        "sum": f"aggregate({scores}, cast(0.0 as double), (a, x) -> a + x)",
        # let-bind the scored array (round-6): avg references it twice,
        # and lambdas re-evaluate inlined subtrees per element.
        "avg": (
            f"transform(array({scores}), _s -> "
            f"aggregate(_s, cast(0.0 as double), (a, x) -> a + x)"
            f" / size(_s))[0]"
        ),
    }[score_mode]
    return matched.withColumn("_score", F.expr(agg))
