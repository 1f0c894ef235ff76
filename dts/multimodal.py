"""Multimodal columns: opaque binary payloads with typed metadata.

Image/audio/video travel as `binary` columns next to typed metadata; all
processing is Arrow-batched ``mapInPandas`` over (id, payload, meta) — the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape) is
real and tested. The actual codec step is STUBBED (no image/audio libs in
this container): ``decode_image`` raises NotImplementedError unless a
deterministic fake decoder is requested, exactly as flagged in the build
brief.

Operators:
- ``attach_payload``: build the binary column + metadata struct
- ``byte_stats``: feature-extract over raw payload bytes (numpy, real)
- ``decode_and_resize``: decode → resize plumbing with stubbed codec;
  ``fake=True`` substitutes a deterministic byte-grid "decoder" so the
  pipeline shape (batch in → tensor-ish out) is exercised end-to-end
- ``frame_sample``: pick every n-th chunk of a payload (frame-sampling
  plumbing for video-like payloads)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BYTE_STATS_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, entropy6 double"
)
DECODE_SCHEMA = "doc_id long, height int, width int, mean_px double"
FRAME_SCHEMA = "doc_id long, frame_id int, frame_bytes binary"


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate an ingested media table: payload = utf-8 bytes of the text
    (deterministic stand-in), meta = struct(kind, n_bytes)."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def byte_stats(media: DataFrame) -> DataFrame:
    """Real feature extraction over opaque bytes: size, mean, entropy."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                if len(b):
                    counts = np.bincount(b, minlength=256).astype(np.float64)
                    p = counts[counts > 0] / len(b)
                    ent = float(-(p * np.log2(p)).sum())
                    rows.append((int(doc_id), len(b), float(b.mean()), round(ent, 6)))
                else:
                    rows.append((int(doc_id), 0, 0.0, 0.0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "mean_byte", "entropy6"]
            )

    return media.select("doc_id", "payload").mapInPandas(gen, BYTE_STATS_SCHEMA)


def decode_image(payload: bytes, fake: bool) -> np.ndarray:
    """STUB: real decoding needs an image lib not present in this
    container. ``fake=True`` yields a deterministic byte grid."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library (PIL/opencv) not "
            "installed in this environment; run with fake=True for the "
            "deterministic stand-in decoder"
        )
    b = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    side = max(1, int(np.sqrt(len(b))))
    return np.resize(b, (side, side))


def decode_and_resize(
    media: DataFrame, out_hw: tuple[int, int] = (8, 8), fake: bool = True
) -> DataFrame:
    """Decode → resize plumbing. Batch shape: Arrow in, fixed-size grid out."""
    oh, ow = out_hw

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(payload, fake)
                # nearest-neighbour resize, pure numpy
                yi = (np.arange(oh) * img.shape[0] // oh).clip(0, img.shape[0] - 1)
                xi = (np.arange(ow) * img.shape[1] // ow).clip(0, img.shape[1] - 1)
                small = img[np.ix_(yi, xi)]
                rows.append((int(doc_id), oh, ow, float(small.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "height", "width", "mean_px"])

    return media.select("doc_id", "payload").mapInPandas(gen, DECODE_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 64, every: int = 4) -> DataFrame:
    """Video-ish frame sampling: split payload into frame_bytes chunks,
    keep every n-th."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = payload or b""
                n_frames = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
                for fi in range(0, n_frames, every):
                    rows.append(
                        (int(doc_id), fi, b[fi * frame_bytes : (fi + 1) * frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_id", "frame_bytes"])

    return media.select("doc_id", "payload").mapInPandas(gen, FRAME_SCHEMA)
