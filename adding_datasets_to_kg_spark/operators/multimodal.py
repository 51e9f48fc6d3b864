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


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, orig_width int, orig_height int"
)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize pass for image rows (video/audio rows pass through untouched):
    Arrow-batched mapInPandas with the pixel work STUBBED (no PIL in this
    container) — the stand-in deterministically rescales the payload length
    by the area ratio, preserving the real pipeline shape: per-batch
    streaming, binary in/binary out, metadata rewritten, originals kept.
    Swap ``_fake_resize`` for ``PIL.Image.resize`` and nothing else changes.
    """

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        # STUB for the real decoder+resampler: deterministic payload
        # truncation/tiling to the area-scaled length.
        target_len = max(1, int(len(payload) * (target_w * target_h) / max(w * h, 1)))
        reps = target_len // max(len(payload), 1) + 1
        return (payload * reps)[:target_len]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["orig_width"] = pdf["width"]
            out["orig_height"] = pdf["height"]
            is_img = pdf["kind"] == "image"
            out.loc[is_img, "payload"] = [
                _fake_resize(p, int(w), int(h))
                for p, w, h in zip(
                    pdf.loc[is_img, "payload"], pdf.loc[is_img, "width"], pdf.loc[is_img, "height"]
                )
            ]
            out.loc[is_img, "width"] = target_w
            out.loc[is_img, "height"] = target_h
            yield out

    return media.mapInPandas(process, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame_payload binary"


def sample_frames(media: DataFrame, frame_stride_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp
    (explode-shaped mapInPandas — rows out ≠ rows in). Frame extraction is
    STUBBED (no ffmpeg): the stand-in slices a deterministic byte window per
    frame; the Spark-side plumbing — per-row fan-out, binary frame payloads,
    batch streaming — is the real contract a decoder plugs into.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            vids = pdf[pdf["kind"] == "video"]
            for _, r in vids.iterrows():
                dur = int(r["duration_ms"]) if not pd.isna(r["duration_ms"]) else 0
                payload = r["payload"]
                for k, ms in enumerate(range(0, dur, frame_stride_ms)):
                    lo = (k * 16) % max(len(payload), 1)
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": k,
                            "frame_ms": ms,
                            "frame_payload": payload[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ms", "frame_payload"])

    return media.mapInPandas(process, schema=FRAME_SCHEMA)


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
