"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container): a
clearly-marked deterministic fake stands in for pixel/sample decoding, while
everything Spark-side — schema, batch iteration, partition sizing, UDF
signatures — is real and tested. Swap ``_fake_decode`` for a PIL/librosa
call and nothing else changes.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough that
batch_rows × max_payload fits worker memory. mapInPandas streams batches —
no per-partition materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha string, "
    "feature array<float>, frames_sampled int"
)


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Manufacture an opaque binary payload column + typed metadata from the
    documents table (deterministic stand-in for real media ingestion)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.when(kind == "image", (F.pmod(F.col(id_col), F.lit(4)) + 1) * 256).cast("int").alias("width"),
        F.when(kind == "image", (F.pmod(F.col(id_col), F.lit(3)) + 1) * 256).cast("int").alias("height"),
        F.when(kind != "image", (F.pmod(F.col(id_col), F.lit(30)) + 1) * 1000).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """STUB: deterministic fake for the real decoder (PIL/librosa/ffmpeg not
    present in this container). Produces an 8-dim 'feature' from byte stats.
    Replace with a real decode + model forward pass in production."""
    if payload is None:
        raise NotImplementedError("real media decode requires image/audio libs")
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(sum(payload[:64]) % 997),
        float(kind == "image"),
        float(kind == "audio"),
        float(kind == "video"),
        float(n % 256),
    ]


def extract_features(media: DataFrame, frame_stride: int = 10) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched, streaming).

    ``frames_sampled`` demonstrates frame-sampling plumbing for video rows
    (duration-based), with the decode itself stubbed.
    """
    import hashlib

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                    "frames_sampled": [
                        max(int((0 if pd.isna(d) else d) // (frame_stride * 100)), 0)
                        for d in pdf["duration_ms"]
                    ],
                }
            )

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)
