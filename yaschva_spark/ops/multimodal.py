"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — asset schema, Arrow-batched
``mapInPandas`` feature extraction with bounded batch memory, partition-count
preservation — and cheap byte-level features (sha256 digest, byte length)
are computed JVM-side (``F.sha2`` / ``F.octet_length``) so the pandas stage
carries ONLY true decode work. :func:`decode_real` parses the header
formats that need no media libraries (BMP, PPM/PGM, WAV — stdlib
``struct`` only); compressed codecs (JPEG/PNG/MP3/MP4/...) raise
``NotImplementedError`` with the integration point documented, and
:func:`decode_features`'s default stub path derives deterministic fake
features from the JVM-computed digest instead (zero payload bytes cross
into Python on that path).

At 100 TB the pattern is: keep payloads in their own parquet column chunk
(columnar pruning means metadata-only queries never read the bytes), size
``spark.sql.execution.arrow.maxRecordsPerBatch`` so batch_bytes ~ batch_rows
x avg_payload fits the executor, and let the pandas stage scale linearly
with partitions.
"""

from __future__ import annotations

import struct
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


def _decode_bmp(payload: bytes) -> tuple[int, int, int]:
    if len(payload) < 26:
        raise ValueError("BMP payload truncated before DIB header")
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size == 12:  # BITMAPCOREHEADER: uint16 dims
        w, h = struct.unpack_from("<HH", payload, 18)
    else:  # BITMAPINFOHEADER (40) and the V4/V5 extensions: int32 dims
        w, h = struct.unpack_from("<ii", payload, 18)
    return int(w), abs(int(h)), 1  # negative height = top-down row order


def _decode_pnm(payload: bytes) -> tuple[int, int, int]:
    """P1-P6 netpbm: magic then whitespace/comment-separated width height."""

    def tokens():
        i, n = 0, len(payload)
        while i < n:
            c = payload[i : i + 1]
            if c == b"#":  # comment to end of line
                while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < n and not payload[j : j + 1].isspace():
                    j += 1
                yield payload[i:j]
                i = j

    it = tokens()
    next(it)  # magic, validated by the caller
    try:
        w, h = int(next(it)), int(next(it))
    except (StopIteration, ValueError) as e:
        raise ValueError("PNM payload: malformed width/height header") from e
    return w, h, 1


def _decode_wav(payload: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE chunk walk: (n_channels, bits_per_sample, n_samples)."""
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("WAV payload: missing RIFF/WAVE header")
    n_channels = bits = block_align = data_size = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            _fmt, n_channels, _rate, _bps, block_align, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
        elif cid == b"data":
            data_size = size
        pos = body + size + (size & 1)  # chunks are word-aligned
    if n_channels is None:
        raise ValueError("WAV payload: no fmt chunk")
    # RIFF does not order chunks: data may precede fmt, so derive
    # n_samples only after the full walk, once block_align is known
    n_samples = data_size // block_align if data_size and block_align else 0
    return int(n_channels), int(bits), int(n_samples)


def decode_real(kind: str, payload: bytes) -> tuple[int, int, int]:
    """Real (library-free) header decode for the formats stdlib can parse:

    * BMP (``BM``) — (width_px, height_px, 1)
    * netpbm P1-P6 (``P1``..``P6``) — (width_px, height_px, 1)
    * WAV (``RIFF``/``WAVE``) — (n_channels, bits_per_sample, n_samples)

    Compressed codecs (JPEG/PNG/MP3/MP4/...) need external media libraries
    not present in this container — plug PIL/torchaudio/pyav in here; until
    then they raise, and :func:`decode_features`'s stub path stands in.
    """
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if len(payload) >= 2 and payload[:1] == b"P" and payload[1:2] in b"123456":
        return _decode_pnm(payload)
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    raise NotImplementedError(
        f"decoding this {kind!r} payload requires media libraries not present "
        "in this container (only BMP/PNM/WAV headers are stdlib-parseable); "
        "decode_features() uses the deterministic stub instead"
    )


def _stub_features(kind: str, digest_hex: str) -> tuple[int, int, int]:
    """Deterministic fake (width, height, n_frames) from the JVM-computed
    payload digest — stable stand-ins so downstream plumbing (schemas,
    joins, aggregations) is fully testable without media libs. This is the
    Python REFERENCE for the Catalyst expression :func:`decode_features`
    compiles on the stub path (tests assert the two agree row-for-row)."""
    d = bytes.fromhex(digest_hex[:6])
    width = 16 + d[0] * 4
    height = 16 + d[1] * 4
    n_frames = 1 if kind == "image" else 1 + d[2]
    return width, height, n_frames


def decode_features(assets: DataFrame, use_stub: bool = True) -> DataFrame:
    """Feature extraction over binary payloads.

    Digest and byte length are Catalyst built-ins (``sha2`` /
    ``octet_length`` — JVM-side, no Python) on both paths. The stub path
    is now PURE Catalyst (r3 verdict #4): :func:`_stub_features` is
    hex-substring arithmetic on the digest, which ``conv(substring(...),
    16, 10)`` expresses directly — no Python stage exists in its plan at
    all (asserted in tests/test_plan_audit.py). The real path ships
    payloads through one Arrow-batched ``mapInPandas`` because the decoder
    must see the bytes; its per-row loop is inherent (header parsing).
    Batch size is governed by the session's ``arrow.maxRecordsPerBatch``."""
    base = assets.select(
        "asset_id",
        "kind",
        F.coalesce(F.octet_length("payload"), F.lit(0)).cast("long").alias("n_bytes"),
        F.sha2(F.coalesce(F.col("payload"), F.lit(b"")), 256).alias("digest"),
        *([] if use_stub else ["payload"]),
    )
    cols = ["asset_id", "kind", "n_bytes", "width", "height", "n_frames", "digest"]

    if use_stub:
        def hexbyte(pos: int):  # digest hex chars [pos, pos+2) as 0..255
            return F.conv(F.substring("digest", pos + 1, 2), 16, 10).cast("int")

        return base.select(
            "asset_id",
            "kind",
            "n_bytes",
            (F.lit(16) + hexbyte(0) * 4).alias("width"),
            (F.lit(16) + hexbyte(2) * 4).alias("height"),
            F.when(F.col("kind") == "image", F.lit(1))
            .otherwise(F.lit(1) + hexbyte(4))
            .alias("n_frames"),
            "digest",
        ).select(*cols)

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats = {"width": [], "height": [], "n_frames": []}
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, nf = decode_real(kind, payload)
                feats["width"].append(w)
                feats["height"].append(h)
                feats["n_frames"].append(nf)
            out = pdf[["asset_id", "kind", "n_bytes"]].copy()
            out["width"] = feats["width"]
            out["height"] = feats["height"]
            out["n_frames"] = feats["n_frames"]
            out["digest"] = pdf["digest"]
            yield out[cols]

    return base.mapInPandas(run, schema=FEATURE_DDL)


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
