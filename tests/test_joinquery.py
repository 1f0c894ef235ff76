"""ES parent-child join queries vs a pandas replay."""

from __future__ import annotations

import pytest

from dts.joinquery import has_child, has_parent


@pytest.fixture(scope="module")
def rel(spark):
    parents = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
        "pk long, tag string",
    )
    children = spark.createDataFrame(
        [
            (1, 10.0, 5), (1, 20.0, 9), (1, 5.0, 2),
            (2, 50.0, 9),
            (3, 1.0, 1),
        ],
        "fk long, _score double, v int",
    )
    return parents, children


def test_has_child_modes(spark, rel):
    parents, children = rel
    got = has_child(
        parents, children, "pk", "fk", "v >= 5", score_mode="max"
    ).toPandas()
    assert dict(zip(got["pk"], got["n_children"])) == {1: 2, 2: 1}
    assert dict(zip(got["pk"], got["_score"])) == {1: 20.0, 2: 50.0}

    s = has_child(
        parents, children, "pk", "fk", None, score_mode="sum",
        min_children=2,
    ).toPandas()
    assert dict(zip(s["pk"], s["_score"])) == {1: 35.0}

    c = has_child(
        parents, children, "pk", "fk", None, score_mode="count",
        max_children=1,
    ).toPandas()
    assert dict(zip(c["pk"], c["_score"])) == {2: 1.0, 3: 1.0}

    none = has_child(parents, children, "pk", "fk", "v >= 5").toPandas()
    assert "_score" not in none.columns and set(none["pk"]) == {1, 2}

    # children without a _score column: constant-score 1.0
    bare = children.drop("_score")
    b = has_child(
        parents, bare, "pk", "fk", None, score_mode="sum"
    ).toPandas()
    assert dict(zip(b["pk"], b["_score"])) == {1: 3.0, 2: 1.0, 3: 1.0}

    with pytest.raises(ValueError):
        has_child(parents, children, "pk", "fk", score_mode="zz")
    with pytest.raises(ValueError):
        has_child(parents, children, "pk", "fk", min_children=0)


def test_has_parent(spark, rel):
    parents, children = rel
    semi = has_parent(
        parents, children.drop("_score"), "pk", "fk", "tag IN ('a', 'c')"
    ).toPandas()
    assert set(semi["fk"]) == {1, 3} and len(semi) == 4
    assert "_score" not in semi.columns

    # with_score REPLACES the child-side _score with the parent's
    sc = has_parent(
        parents.withColumn("_score", parents["pk"].cast("double") * 10),
        children, "pk", "fk", "tag = 'a'", with_score=True,
    ).toPandas()
    assert set(sc["fk"]) == {1} and (sc["_score"] == 10.0).all()

    # parent without _score: constant 1.0
    one = has_parent(
        parents, children, "pk", "fk", "tag = 'b'", with_score=True,
    ).toPandas()
    assert set(one["fk"]) == {2} and (one["_score"] == 1.0).all()


def test_nested_match_same_element_semantics(spark):
    from dts.joinquery import nested_match

    docs = spark.createDataFrame(
        [
            (0, [(1, 50.0), (2, 10.0)]),   # same element satisfies both
            (1, [(1, 10.0), (9, 50.0)]),   # conditions split → NO match
            (2, [(2, 45.0), (1, 60.0)]),   # two matching elements
            (3, []),
        ],
        "doc_id long, items array<struct<ln int, q double>>",
    )
    pred = "_e.q >= 45 AND _e.ln <= 2"
    assert {
        r["doc_id"] for r in nested_match(docs, "items", pred).collect()
    } == {0, 2}

    got = {
        r["doc_id"]: r["_score"]
        for r in nested_match(
            docs, "items", pred, score_expr_sql="_e.q", score_mode="max"
        ).collect()
    }
    assert got == {0: 50.0, 2: 60.0}
    s = {
        r["doc_id"]: r["_score"]
        for r in nested_match(
            docs, "items", pred, score_expr_sql="_e.q", score_mode="sum"
        ).collect()
    }
    assert s == {0: 50.0, 2: 105.0}
    a = {
        r["doc_id"]: r["_score"]
        for r in nested_match(
            docs, "items", pred, score_expr_sql="_e.q", score_mode="avg"
        ).collect()
    }
    assert a == {0: 50.0, 2: 52.5}

    import pytest as _pt

    with _pt.raises(ValueError):
        nested_match(docs, "items", pred, score_mode="zz")
    with _pt.raises(ValueError):
        nested_match(docs, "items", pred, score_mode="max")
