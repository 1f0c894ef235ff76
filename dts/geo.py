"""Geo queries over doc-value coordinates (ES geo_distance /
geo_bounding_box / sort-by-distance).

ES stores geo_points as doc values and answers the two staple filters —
bounding box (pure comparisons) and distance (haversine) — plus
distance sorting. The engine analogue: latitude/longitude live as
numeric doc values (any two columns), and every operator here is a
single codegen scan predicate or expression over them — no index
structure needed at these selectivities (Lucene's BKD tree buys
sub-linear filtering; the parquet row-group min/max stats on a
lat-sorted layout give the same pruning if the sidecar is range-binned
with dts.docvalues.sort_index_meta — compose them for the O(selected)
path).

Cross-engine exactness: the bounding box is integer/double comparisons
(hash-exact). Haversine goes through sin/cos/asin — JVM StrictMath and
DuckDB libm may differ in the last ulps, so distances are rounded to
3 dp (millimeters on meters — far above the ~1e-7 m worst-case libm
drift, far below any ranking-relevant gap) before ordering/emission.

Delta vs ES (documented): no antimeridian-crossing boxes (left ≤ right
required) and no geo_shape; points only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(
    lat_col: str, lon_col: str, origin_lat: float, origin_lon: float
):
    """Great-circle distance in meters from (origin_lat, origin_lon) —
    one closed-form expression, whole-stage codegen."""
    lat1 = F.radians(F.lit(float(origin_lat)))
    lon1 = F.radians(F.lit(float(origin_lon)))
    lat2 = F.radians(F.col(lat_col))
    lon2 = F.radians(F.col(lon_col))
    a = (
        F.pow(F.sin((lat2 - lat1) / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin((lon2 - lon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def geo_bounding_box_docs(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> DataFrame:
    """ES geo_bounding_box filter: docs inside [bottom, top] ×
    [left, right] (inclusive, no antimeridian wrap). Pure comparisons —
    pushed to the scan; null coords drop."""
    if left > right or bottom > top:
        raise ValueError("box must satisfy left <= right, bottom <= top")
    return docs.filter(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & (F.col(lat_col) >= F.lit(float(bottom)))
        & (F.col(lat_col) <= F.lit(float(top)))
        & (F.col(lon_col) >= F.lit(float(left)))
        & (F.col(lon_col) <= F.lit(float(right)))
    )


def geo_distance_topk(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    k: int = 10,
    radius_m: float | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES geo_distance filter + sort-by-distance: the k nearest docs to
    the origin (optionally only those within ``radius_m``), ordered by
    haversine distance rounded to 3 dp (ties → ``id_col`` asc). Returns
    (id_col, dist3, rank)."""
    d3 = F.round(
        haversine_m(lat_col, lon_col, origin_lat, origin_lon), 3
    ).alias("dist3")
    side = docs.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(id_col, d3)
    if radius_m is not None:
        side = side.filter(F.col("dist3") <= F.lit(float(radius_m)))
    # Distributed top-k: orderBy().limit(k) compiles to
    # TakeOrderedAndProject (per-partition k-heaps + driver merge) —
    # never a corpus-scale single-partition sort. Rank is attached by a
    # window over the ALREADY k-row result (total order (dist3, id) is
    # tie-free, so rank over the limited rows equals rank over all rows).
    top = side.orderBy(F.col("dist3").asc(), F.col(id_col).asc()).limit(k)
    w = Window.partitionBy().orderBy(
        F.col("dist3").asc(), F.col(id_col).asc()
    )
    return top.select(
        id_col,
        "dist3",
        F.row_number().over(w).cast("int").alias("rank"),
    )
