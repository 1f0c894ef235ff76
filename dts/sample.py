"""Deterministic, engine-portable sampling for training-data pipelines.

``F.rand()`` is partition-order-dependent and irreproducible across
engines; a 100-TB pipeline needs samples that are (a) stable under
re-partitioning and retries, (b) recomputable by any engine that can hash
(the DuckDB oracle included), (c) composable — the same (seed, key) always
lands on the same side of the cut, so incremental runs sample
consistently. The standard recipe: hash the row key with a seed, keep
rows whose hash falls below fraction · 2^32. md5 is bit-identical in
Spark and DuckDB (the repo's portable-hash convention — see dts.dedup),
so the probe checks EXACT membership, not just counts.

All pure JVM expressions (md5 + conv + comparison) — whole-stage codegen,
no Python, no shuffle: sampling is a map-side filter that composes with
predicate pushdown upstream of any heavier operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_u32(key_col, seed: str):
    """First 8 hex digits of md5(seed || key) as an unsigned 32-bit int —
    a uniform [0, 2^32) draw, identical in Spark and DuckDB."""
    h = F.md5(F.concat(F.lit(seed), key_col.cast("string")))
    return F.conv(h.substr(1, 8), 16, 10).cast("bigint")


def hash_sample(
    docs: DataFrame,
    fraction: float,
    key: str = "doc_id",
    seed: str = "dts-sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by ``key``: a row is
    in the sample iff hash32(seed, key) < fraction · 2^32 — stable across
    partitionings, retries and engines."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * 2**32)
    return docs.filter(_hash_u32(F.col(key), seed) < F.lit(cut))


def stratified_hash_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key: str = "doc_id",
    seed: str = "dts-sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mixture
    knob ("keep 100% of python, 10% of markdown"). ``fractions`` maps
    stratum value → keep fraction; strata not listed keep
    ``default_fraction``. Same hash cut as ``hash_sample``, so a doc's
    membership never depends on which stratum map produced it."""
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} out of [0, 1]: {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction out of [0, 1]: {default_fraction}")
    pairs = []
    for stratum, frac in sorted(fractions.items()):
        pairs.extend([F.lit(stratum), F.lit(int(frac * 2**32))])
    cut = (
        F.element_at(F.create_map(*pairs), F.col(stratum_col))
        if pairs
        else F.lit(None)
    )
    cut = F.coalesce(cut, F.lit(int(default_fraction * 2**32)))
    return docs.filter(_hash_u32(F.col(key), seed) < cut)
