"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — asset schema, Arrow-batched
``mapInPandas`` feature extraction with bounded batch memory, partition-count
preservation — while the actual media decode is STUBBED (this container has
no image/audio libraries): :func:`decode_features` derives deterministic
fake features from the payload bytes, and :func:`decode_real` raises
``NotImplementedError`` with the integration point documented.

At 100 TB the pattern is: keep payloads in their own parquet column chunk
(columnar pruning means metadata-only queries never read the bytes), size
``spark.sql.execution.arrow.maxRecordsPerBatch`` so batch_bytes ~ batch_rows
x avg_payload fits the executor, and let the pandas stage scale linearly
with partitions.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_DDL = (
    "asset_id long, kind string, payload binary, "
    "meta map<string,string>"
)

FEATURE_DDL = (
    "asset_id long, kind string, n_bytes long, "
    "width int, height int, n_frames int, digest string"
)


def synthetic_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (binary payloads derived from sha2)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    h = F.abs(F.xxhash64("id", F.lit(seed)))
    payload = F.to_binary(
        F.repeat(F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256),
                 (F.pmod(h, F.lit(8)) + 1).cast("int")),
        F.lit("utf-8"),
    )
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        kinds[F.pmod(h, F.lit(3))].alias("kind"),
        payload.alias("payload"),
        F.create_map(F.lit("source"), F.concat(F.lit("synthetic/"), F.col("id").cast("string"))).alias("meta"),
    )


def decode_real(kind: str, payload: bytes):
    """The real decode integration point. Plug PIL/torchaudio/pyav here."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; decode_features() uses the deterministic stub instead"
    )


def _stub_features(kind: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake (width, height, n_frames) from the payload digest —
    stable stand-ins so downstream plumbing (schemas, joins, aggregations)
    is fully testable without media libs."""
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] * 4
    height = 16 + d[1] * 4
    n_frames = 1 if kind == "image" else 1 + d[2]
    return width, height, n_frames


def decode_features(assets: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One pandas call per Arrow batch; batch size is governed by the session's
    ``arrow.maxRecordsPerBatch``. The stub path never materializes decoded
    frames — only per-asset features leave the stage."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = {"width": [], "height": [], "n_frames": [], "digest": [], "n_bytes": []}
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if use_stub:
                    w, h, nf = _stub_features(kind, payload)
                else:  # pragma: no cover - requires media libs
                    w, h, nf = decode_real(kind, payload)
                feats["width"].append(w)
                feats["height"].append(h)
                feats["n_frames"].append(nf)
                feats["digest"].append(hashlib.sha256(payload).hexdigest())
                feats["n_bytes"].append(len(payload))
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": feats["n_bytes"],
                    "width": feats["width"],
                    "height": feats["height"],
                    "n_frames": feats["n_frames"],
                    "digest": feats["digest"],
                }
            )
            yield out

    return assets.mapInPandas(run, schema=FEATURE_DDL)


def frame_sample_plan(assets: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: which (asset, frame_idx) to decode —
    pure Catalyst (sequence + explode), so the expensive decode fan-out is
    planned and partitioned before any Python runs."""
    feats = decode_features(assets)
    return feats.filter(F.col("kind") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


def resize_plan(
    assets: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    use_stub: bool = True,
) -> DataFrame:
    """Resize stage: (asset_id, kind, width, height, target_w, target_h,
    scale_x, scale_y, resized_digest).

    The geometry (scale factors, letterboxing decisions) is computed from
    the extracted features as plain Catalyst expressions; only the pixel
    work would live in the pandas stage, and it is STUBBED here (a
    deterministic digest of (payload digest, target dims) stands in for the
    resized bytes — plug a PIL/opencv kernel into ``decode_real`` for the
    real path). Partitioning and schema shape are production-real."""
    feats = decode_features(assets, use_stub=use_stub)
    return feats.select(
        "asset_id",
        "kind",
        "width",
        "height",
        F.lit(target_w).alias("target_w"),
        F.lit(target_h).alias("target_h"),
        (F.lit(target_w) / F.col("width")).alias("scale_x"),
        (F.lit(target_h) / F.col("height")).alias("scale_y"),
        F.sha2(
            F.concat_ws(":", F.col("digest"), F.lit(target_w), F.lit(target_h)), 256
        ).alias("resized_digest"),
    )
