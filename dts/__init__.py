"""dts — a brand-new PySpark-native full-text search engine.

Built from scratch (NOT a port) with the query capabilities of the reference
FabienRoger/Distributed-Text-Search (an MPI+OpenMP+CUDA approximate
string-matching engine, see /root/reference and SURVEY.md): here the
reference's corpus scan + Levenshtein sliding-window matching is re-expressed
as an inverted-index build (docID-sorted posting lists, delta+varint block
compression), a salted term-partitioned merge with head-term skew handling,
BM25 top-k scoring with block-max WAND, and banded-edit-distance fuzzy term
expansion — all DataFrame-first with vectorized Arrow/pandas UDFs (no
per-row Python anywhere).

Modules:
    session     SparkSession factory with the engine's required confs
    tokenizer   code-aware tokenizer (single source of truth, shared w/ oracle)
    corpus      deterministic synthetic source-code corpus (FIXTURES.md §1)
    io          source-table ingest: sha256 invariant, stable doc_id
    codec       delta+varint posting-block codec (pure numpy)
    index_build posting-list construction + salted term-partitioned merge
    fuzzy       trigram candidate generation + banded edit-distance verify
    score       BM25 scoring — pure-DataFrame path and index-backed
                (TAAT-vectorized and block-max WAND DAAT) paths
    checkpoint  per-partition manifests: lineage, metrics, resume
    oracle      single-process numpy reference engine (the `apm1` analogue,
                cf. reference src/apm1.c — the spec for rank identity)
"""

__version__ = "0.1.0"
