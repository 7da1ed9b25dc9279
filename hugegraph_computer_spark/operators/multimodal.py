"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Codec-FREE formats are decoded for real (pure-numpy binary PPM and RIFF/
WAVE PCM16 parsers — ``real_decode``); compressed codecs (JPEG/MP3/video)
still raise ``DecoderUnavailable``, the declared seam for PIL/librosa/av
on a real cluster image. The Spark-side machinery is real and tested:

* schema: ``(asset_id long, modality string, payload binary,
  meta struct<width int, height int, sample_rate int, n_frames int>)``
* partition-aware batch processing via ``mapInPandas`` — Arrow batches of
  binary payloads, bounded batch size (``spark.sql.execution.arrow.
  maxRecordsPerBatch``) so a partition of large blobs never materializes
  at once,
* feature extraction / resize / frame-sample UDF signatures with typed
  output schemas, ready to swap a real decoder in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("n_frames", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-decoder path for formats needing codec libs."""


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) image with pure numpy — a REAL container
    parse (magic, '#' comments, ASCII dims/maxval, raw pixel plane), no
    codec library needed. Returns uint8 pixels shaped (h, w, 3)."""
    img, _end = _decode_ppm_at(payload, 0)
    return img


def _decode_ppm_at(
    payload: bytes, pos: int, skip_raster: bool = False
) -> tuple[np.ndarray | None, int]:
    """Parse ONE P6 frame starting at ``pos`` inside a (possibly
    concatenated) PPM stream; returns (pixels, end_offset). This is the
    walk step for PPM video streams — ``ffmpeg -f image2pipe -vcodec
    ppm`` emits exactly back-to-back P6 frames, so end_offset of frame
    f is the start of frame f+1. With ``skip_raster`` the header is
    still fully parsed (it must be — offsets are data-dependent) but
    the pixel plane is only cursor-skipped, never materialized."""

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            c = payload[pos:pos + 1]
            if c == b"#":  # comment runs to end of line
                while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    if token() != b"P6":
        raise DecoderUnavailable("not a binary PPM (P6) payload")
    w, h, maxval = int(token()), int(token()), int(token())
    if maxval > 255:
        raise DecoderUnavailable("16-bit PPM not supported")
    pos += 1  # exactly ONE whitespace byte separates maxval from raster
    end = pos + w * h * 3
    if end > len(payload):
        raise ValueError(f"truncated PPM raster: {len(payload) - pos} < {w * h * 3}")
    if skip_raster:
        return None, end
    img = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(h, w, 3)
    return img, end


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE PCM16 file with pure numpy — real chunk
    iteration (not fixed offsets), fmt validation, int16 samples.
    Returns (sample_rate, samples int16 1-D, channels interleaved)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecoderUnavailable("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, _channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise DecoderUnavailable(f"only PCM16 supported (fmt={audio_format}, bits={bits})")
    return rate, np.frombuffer(data, dtype="<i2")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit, no interlace)


def _png_unfilter(filt: np.ndarray, prior: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Invert one scanline's PNG filter (RFC 2083 §6). Filters None/Up
    are vectorized; Sub is a per-lane modular cumsum; Average/Paeth are
    genuinely sequential in x (left-neighbor recurrence) — a per-byte
    loop bounded by the row width, the same shape libpng uses."""
    n = len(filt)
    if ftype == 0:
        return filt.copy()
    if ftype == 2:  # Up
        return (filt.astype(np.int32) + prior).astype(np.uint8)
    if ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] — lane cumsum
        out = filt.astype(np.int64).copy()
        pad = (-n) % bpp
        lanes = np.concatenate([out, np.zeros(pad, np.int64)]).reshape(-1, bpp)
        return (
            np.cumsum(lanes, axis=0).reshape(-1)[:n] % 256
        ).astype(np.uint8)
    out = np.empty(n, np.uint8)
    for x in range(n):
        left = int(out[x - bpp]) if x >= bpp else 0
        up = int(prior[x])
        if ftype == 3:  # Average
            out[x] = (int(filt[x]) + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            ul = int(prior[x - bpp]) if x >= bpp else 0
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out[x] = (int(filt[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    """Parse a PNG with the stdlib only (zlib) + numpy — a REAL
    compressed-container decode: signature, chunk walk (length/type/crc
    framing, ancillary chunks skipped), multi-IDAT concatenation,
    zlib inflate, per-scanline unfilter of all five filter types.
    Supports 8-bit gray/RGB/RGBA, non-interlaced (the overwhelming
    training-corpus case); 16-bit, palette, and Adam7 raise
    DecoderUnavailable. Returns uint8 pixels shaped (h, w, channels)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise DecoderUnavailable("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise DecoderUnavailable(
            f"PNG depth={depth} color_type={color_type} interlace={interlace} "
            "not supported by the stdlib decoder (needs PIL)"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG inflated size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    for y in range(h):
        prior = _png_unfilter(rows[y, 1:], prior, int(rows[y, 0]), ch)
        out[y] = prior
    return out.reshape(h, w, ch)


def real_decode(payload: bytes, modality: str) -> np.ndarray:
    """REAL decode for the self-contained container formats: binary PPM
    and stdlib-zlib PNG images, PCM16 WAV audio — parsed with pure
    numpy. Returns uint8 pixels (h, w, channels) for images, int16
    samples for audio. Video (and codec-bound formats: JPEG/MP3/MP4)
    still raises DecoderUnavailable — those need PIL/librosa/av on the
    cluster image, and this is exactly the seam to swap them into."""
    if modality == "image":
        data = bytes(payload)
        if data[:8] == _PNG_SIG:
            return _decode_png(data)
        return _decode_ppm(data)
    if modality == "audio":
        return _decode_wav(bytes(payload))[1]
    raise DecoderUnavailable(
        f"no codec-free decoder for modality={modality!r}; install "
        "PIL/librosa/av on the cluster image and extend real_decode"
    )


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets for pipeline testing."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8  # 256 B
        meta = (64, 64, None, None) if modality == "image" else (
            (None, None, 16000, None) if modality == "audio" else (64, 64, None, 30)
        )
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synth_real_assets(spark: SparkSession, n: int = 48, seed: int = 7) -> DataFrame:
    """Deterministic REAL container payloads: even ids are 8x8 binary
    PPM images (with a header comment, exercising the parser), odd ids
    are 64-sample 16 kHz PCM16 WAVs. Pixel/sample bytes are sha256
    digest chains of ``"{seed}:{i}:{block}"`` so a DuckDB oracle can
    re-derive the decoded statistics without parsing binaries — the
    Spark side MUST parse the actual container to match."""
    import struct

    rows = []
    for i in range(n):
        blocks = lambda k: b"".join(  # noqa: E731
            hashlib.sha256(f"{seed}:{i}:{b}".encode()).digest() for b in range(k)
        )
        if i % 2 == 0:
            payload = b"P6\n# synthetic asset\n8 8\n255\n" + blocks(6)  # 192 B raster
            rows.append((i, "image", bytearray(payload), (8, 8, None, None)))
        else:
            data = blocks(4)  # 128 B = 64 int16 samples
            hdr = (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
                + b"data" + struct.pack("<I", len(data))
            )
            rows.append((i, "audio", bytearray(hdr + data), (None, None, 16000, None)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synth_video_assets(
    spark: SparkSession,
    n: int = 24,
    seed: int = 11,
    w: int = 8,
    h: int = 4,
    n_frames: int = 24,
) -> DataFrame:
    """Deterministic REAL video streams: each payload is ``n_frames``
    back-to-back binary P6 PPM frames — the exact byte stream
    ``ffmpeg -f image2pipe -vcodec ppm`` produces — with a per-frame
    ``# frame <f>`` header comment so frame offsets are NOT arithmetic
    (the parser must genuinely walk every header). Frame ``f``'s raster
    bytes are the sha256 digest chain of ``"{seed}:{i}:{f}:{block}"``,
    so a DuckDB oracle re-derives sampled-frame statistics without
    parsing binaries while the Spark side must parse the stream."""
    rows = []
    raster_len = w * h * 3
    n_blocks = -(-raster_len // 32)
    for i in range(n):
        frames = []
        for f in range(n_frames):
            raster = b"".join(
                hashlib.sha256(f"{seed}:{i}:{f}:{b}".encode()).digest()
                for b in range(n_blocks)
            )[:raster_len]
            frames.append(f"P6\n# frame {f}\n{w} {h}\n255\n".encode() + raster)
        rows.append((i, "video", bytearray(b"".join(frames)), (w, h, None, n_frames)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synth_png_assets(
    spark: SparkSession,
    n: int = 32,
    seed: int = 13,
    w: int = 16,
    h: int = 16,
) -> DataFrame:
    """Deterministic REAL PNG files: 8-bit RGB, one ancillary tEXt chunk
    (the chunk walk must skip it), scanline ``y`` filtered with type
    ``y % 5`` — every PNG filter (None/Sub/Up/Average/Paeth) appears in
    every file, so the decoder must invert all five to recover the
    raster. Raster bytes are the sha256 digest chain of
    ``"{seed}:{i}:{block}"`` (same convention as synth_real_assets), so
    a DuckDB oracle re-derives decoded statistics from the formula while
    the Spark side must genuinely inflate + unfilter the container."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raster_len = w * h * 3
    n_blocks = -(-raster_len // 32)
    rows = []
    for i in range(n):
        raster = b"".join(
            hashlib.sha256(f"{seed}:{i}:{b}".encode()).digest()
            for b in range(n_blocks)
        )[:raster_len]
        img = np.frombuffer(raster, np.uint8).reshape(h, w * 3).astype(np.int32)
        lines = []
        for y in range(h):
            f = y % 5
            cur = img[y]
            prior = img[y - 1] if y > 0 else np.zeros(w * 3, np.int32)
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            upleft = np.concatenate([np.zeros(3, np.int32), prior[:-3]])
            if f == 0:
                filt = cur
            elif f == 1:
                filt = cur - left
            elif f == 2:
                filt = cur - prior
            elif f == 3:
                filt = cur - (left + prior) // 2
            else:  # Paeth predictor per RFC 2083
                p = left + prior - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - prior),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prior, upleft),
                )
                filt = cur - pred
            lines.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"tEXt", b"Comment\x00synthetic asset")
            + chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
            + chunk(b"IEND", b"")
        )
        rows.append((i, "image", bytearray(payload), (w, h, None, None)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_vals", LongType(), False),
        StructField("sum_val", LongType(), False),
        StructField("sumsq", LongType(), False),
    ]
)


def decode_stats(assets: DataFrame) -> DataFrame:
    """Decode every payload with the REAL decoders (mapInPandas / Arrow)
    and emit exact integer statistics of the decoded values (pixel bytes
    / int16 samples) — value-hash-checkable against an oracle that
    re-derives them from the generator formula. The decode is a genuine
    container parse; a wrong byte anywhere shifts sum/sumsq."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("asset_id", "modality", "n_vals", "sum_val", "sumsq")}
            for aid, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                vals = real_decode(bytes(payload), modality).reshape(-1).astype(np.int64)
                out["asset_id"].append(aid)
                out["modality"].append(modality)
                out["n_vals"].append(len(vals))
                out["sum_val"].append(int(vals.sum()))
                out["sumsq"].append(int((vals * vals).sum()))
            yield pd.DataFrame(out)

    stats = assets.mapInPandas(batches, schema=DECODE_STATS_SCHEMA)
    return stats.withColumn(
        "mean_val", F.round(F.col("sum_val") / F.col("n_vals"), 6)
    )


def extract_features(assets: DataFrame, dim: int = 16, use_real_decoder: bool = False) -> DataFrame:
    """Batch feature extraction over binary payloads (mapInPandas / Arrow).

    With ``use_real_decoder=False`` features are a deterministic fake
    drawn from the portable 60-bit md5 hash family (6-decimal values in
    [0, 1)), so the full distributed path — schema, batching, shuffle —
    is exercised without codecs AND the output is reproducible in DuckDB
    for the correctness gate. The real path raises DecoderUnavailable
    where the decode call belongs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                if use_real_decoder:
                    real_decode(bytes(payload), modality)  # raises
                # fake features from the ENGINE-PORTABLE 60-bit md5 family
                # (same family as simhash / the corpus generator): component
                # j = (int(md5(payload_hex ':' j)[:15], 16) % 1e6) / 1e6.
                # DuckDB re-derives the identical values in SQL
                # (oracles.multimodal_features_sql), so the full
                # mapInPandas/Arrow path is value-hash-checkable — unlike
                # the r2 PCG64 draws, which had no SQL twin.
                hexp = bytes(payload).hex()
                feats.append(
                    np.array(
                        [
                            (
                                int(
                                    hashlib.md5(
                                        f"{hexp}:{j}".encode()
                                    ).hexdigest()[:15],
                                    16,
                                )
                                % 1_000_000
                            )
                            / 1e6
                            for j in range(dim)
                        ],
                        dtype=np.float32,
                    )
                )
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "feature": [list(f) for f in feats]}
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("out_w", LongType(), False),
        StructField("out_h", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("n_vals", LongType(), False),
        StructField("sum_val", LongType(), False),
        StructField("sumsq", LongType(), False),
    ]
)


def resize_images(assets: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Nearest-neighbor image resize over REAL-decoded PPM payloads
    (mapInPandas / Arrow), re-encoded as binary PPM.

    Each image is genuinely container-parsed (``_decode_ppm``: magic,
    comments, dims), resampled with the standard half-pixel-center map
    ``src = ((2*dst + 1) * src_dim) // (2 * dst_dim)`` — integer-exact,
    so ``oracles.multimodal_resize_sql`` re-derives the resized pixel
    statistics straight from the generator formula while the Spark side
    must parse the actual bytes. The output row carries the re-encoded
    P6 payload (round-trip asserted in tests) plus exact integer stats
    (the value-hash surface); ``mean_val`` is appended for readability.

    The reference engine has no multimodal surface — this is one of the
    training-data-pipeline extensions (decode / feature-extract /
    resize / frame-sample); only images are resizable, so non-image
    modalities are filtered out up front (predicate reaches the scan).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "out_w", "out_h", "payload",
                "n_vals", "sum_val", "sumsq",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = _decode_ppm(bytes(payload))
                h, w = img.shape[:2]
                ys = ((2 * np.arange(out_h) + 1) * h) // (2 * out_h)
                xs = ((2 * np.arange(out_w) + 1) * w) // (2 * out_w)
                small = img[ys][:, xs]
                flat = small.reshape(-1).astype(np.int64)
                enc = (f"P6\n{out_w} {out_h}\n255\n".encode()
                       + small.tobytes())
                out["asset_id"].append(aid)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["payload"].append(enc)
                out["n_vals"].append(len(flat))
                out["sum_val"].append(int(flat.sum()))
                out["sumsq"].append(int((flat * flat).sum()))
            yield pd.DataFrame(out)

    resized = (
        assets.where(F.col("modality") == "image")
        .mapInPandas(batches, schema=RESIZE_SCHEMA)
    )
    return resized.withColumn(
        "mean_val", F.round(F.col("sum_val") / F.col("n_vals"), 6)
    )


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("n_vals", LongType(), False),
        StructField("sum_val", LongType(), False),
        StructField("sumsq", LongType(), False),
    ]
)


def frame_sample_decode(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """Decode every ``every_n``-th frame of each PPM video stream and
    emit exact integer pixel statistics per sampled frame.

    The walk is a genuine streaming seek: every frame header is parsed
    (magic, per-frame comment, dims — offsets are data-dependent, not
    arithmetic), but only sampled frames' rasters are materialized as
    arrays; skipped frames advance the cursor by their header-declared
    raster length. Per-task memory is therefore bounded by ONE frame
    plus the Arrow batch, regardless of video length — the decode-side
    realization of ``frame_sample_plan``'s explode-before-decode shape,
    and the same indices ``0, every_n, 2·every_n, …`` the plan emits.

    The reference engine has no multimodal surface; this is the
    frame-sample member of the training-pipeline extension family
    (decode / feature-extract / resize / frame-sample)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "frame_index", "n_vals", "sum_val", "sumsq",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                stream = bytes(payload)
                pos, f = 0, 0
                while pos < len(stream):
                    sampled = f % every_n == 0
                    img, pos = _decode_ppm_at(stream, pos, skip_raster=not sampled)
                    if sampled:
                        flat = img.reshape(-1).astype(np.int64)
                        out["asset_id"].append(aid)
                        out["frame_index"].append(f)
                        out["n_vals"].append(len(flat))
                        out["sum_val"].append(int(flat.sum()))
                        out["sumsq"].append(int((flat * flat).sum()))
                    f += 1
            yield pd.DataFrame(out)

    stats = (
        assets.where(F.col("modality") == "video")
        .mapInPandas(batches, schema=FRAME_STATS_SCHEMA)
    )
    return stats.withColumn(
        "mean_val", F.round(F.col("sum_val") / F.col("n_vals"), 6)
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: (asset_id, frame_index) rows derived
    from metadata only — the decode of each sampled frame is the stubbed
    kernel. Shows the explode-before-decode pattern that keeps per-task
    memory bounded for long videos."""
    return (
        assets.where(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(every_n)
                )
            ).alias("frame_index"),
        )
    )
