"""Multimodal column handling: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a typed
metadata struct alongside (``modality``, ``format``, byte length). The
Spark-side plumbing — schema, partition sizing, Arrow-batched
``mapInPandas`` signatures — is real and tested. Decoding: uncompressed
24-bit BMP and RIFF/PCM WAV decode FOR REAL (``decode_bmp`` /
``decode_wav`` — pure struct + numpy, q96/q97-oracle-verified);
compressed formats route through the OPTIONAL real-codec path
(``decode_image_any`` → PIL, ``decode_audio_any`` → soundfile) when
those libraries are importable, and degrade to ``NotImplementedError``
data rows otherwise — so a production cluster with pillow/soundfile
installed runs JPEG/PNG/FLAC corpora through the SAME operators,
schemas, and call sites, with zero code change. Video stays stubbed
(PyAV-class dependency).

Scale notes: binary rows are large — keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a partition
of images fits executor memory, and prefer ``mapInPandas`` (streaming
batch iterator) over ``collect``-style UDFs so each Arrow batch is
bounded.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F



try:  # real decoders are optional; everything degrades to stubs
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

try:  # optional compressed-audio codec (FLAC/OGG/float WAV)
    import soundfile  # noqa: F401

    _HAS_SOUNDFILE = True
except ImportError:
    _HAS_SOUNDFILE = False

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, byte_len int, content_sha string, "
    "feature array<double>"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Test harness: synthesize a deterministic binary payload column
    (UTF-8 bytes of the text) with typed metadata, standing in for
    real image/audio bytes."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("raw").alias("format"),
            F.length(F.encode(F.col(text_col), "UTF-8")).alias("byte_len"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — requires PIL, not present in this
    environment. STUB: raises until a codec library is installed."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; install pillow to enable"
        )
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The pipeline shape is the real thing (mapInPandas over bounded
    batches); the per-payload 'feature' is a deterministic fake —
    an 8-bucket byte histogram — standing in for a model embedding.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"].tolist()
            features, lens, shas = [], [], []
            for payload in payloads:
                arr = np.frombuffer(payload, dtype=np.uint8)
                total = max(arr.size, 1)
                hist = np.bincount(arr >> 5, minlength=8)[:8] / total
                features.append(hist.tolist())
                lens.append(arr.size)
                shas.append(hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "byte_len": lens,
                    "content_sha": shas,
                    "feature": features,
                }
            )

    # No repartition: binary rows are heavy relative to the per-row
    # work here, so an extra shuffle costs more than it parallelizes
    # (measured); real decode workloads would flip that tradeoff.
    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, n_frames: int = 4, payload_col: str = "payload"
) -> DataFrame:
    """Frame/segment sampling plumbing: split each binary payload into
    ``n_frames`` evenly-spaced slices (stand-in for video frame
    extraction; a real codec would decode then sample). JVM-side
    ``substring`` on binary — no Python in the row path."""
    length = F.length(F.col(payload_col))
    frames = F.array(
        *[
            F.substring(
                F.col(payload_col),
                (length * i / n_frames).cast("int") + 1,
                F.greatest((length / n_frames).cast("int"), F.lit(1)),
            )
            for i in range(n_frames)
        ]
    )
    return df.select(
        "doc_id",
        F.posexplode(frames).alias("frame_idx", "frame_bytes"),
    ).withColumn("frame_len", F.length("frame_bytes"))


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, byte_len int, "
    "orig_byte_len int, scale double"
)


def resize_payload(
    df: DataFrame,
    target_bytes: int = 256,
    payload_col: str = "payload",
    batch_hint: int = 1024,
) -> DataFrame:
    """Resize plumbing (image thumbnail / audio downsample stand-in).

    Real resize = decode -> interpolate -> re-encode, which needs
    codec libraries; the STUB keeps the exact pipeline shape
    (Arrow-batched ``mapInPandas``, binary in / binary out, bounded
    batches) and performs a deterministic byte-stride downsample to
    ~``target_bytes`` — swapping in PIL's ``Image.resize`` changes
    only the per-payload body. Payloads at/below the target pass
    through untouched (scale 1.0).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_payload, out_len, orig_len, scales = [], [], [], []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = arr.size
                if n <= target_bytes:
                    resized = arr
                else:
                    idx = np.linspace(0, n - 1, target_bytes).astype(np.int64)
                    resized = arr[idx]
                out_payload.append(resized.tobytes())
                out_len.append(resized.size)
                orig_len.append(n)
                scales.append(resized.size / n if n else 1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": out_payload,
                    "byte_len": out_len,
                    "orig_byte_len": orig_len,
                    "scale": scales,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


RESIZED_IMAGE_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, "
    "decode_error string"
)


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize — decode (any container
    :func:`decode_image_any` supports: BMP and truecolor PNG decode
    dependency-free here; JPEG/GIF via PIL where installed) →
    nearest-neighbor resample → re-encode as PNG. The full
    decode-transform-encode loop runs on actual pixels with zero
    codec dependencies — the thumbnail/downsample stage of a
    multimodal training pipeline, not a byte-stride stand-in
    (:func:`resize_payload` remains the shape-only stub for formats
    without an in-repo codec).

    Nearest-neighbor mapping (engine-reproducible, no float
    geometry): output pixel ``(x, y)`` reads source pixel
    ``(floor(x·W/width), floor(y·H/height))`` — integer arithmetic,
    so an analytic oracle can verify every output pixel (q182).
    Corrupt/unsupported payloads become ``decode_error`` DATA rows
    with a NULL payload, never job failures.

    Same Arrow-batched ``mapInPandas`` shape as the other multimodal
    operators: bounded batches, binary in / binary out.
    """
    if width < 1 or height < 1:
        raise ValueError("width and height must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, ws, hs, errs = [], [], [], []
            for payload in pdf[payload_col].tolist():
                try:
                    rgb = decode_image_any(bytes(payload))
                except (
                    ValueError,
                    NotImplementedError,
                    struct.error,
                    OSError,
                ) as exc:
                    payloads.append(None)
                    ws.append(None)
                    hs.append(None)
                    errs.append(str(exc))
                    continue
                src_h, src_w = rgb.shape[0], rgb.shape[1]
                xs = (np.arange(width, dtype=np.int64) * src_w) // width
                ys = (np.arange(height, dtype=np.int64) * src_h) // height
                out = rgb[np.ix_(ys, xs)]
                payloads.append(encode_png(out))
                ws.append(width)
                hs.append(height)
                errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_IMAGE_SCHEMA)


def decode_bmp(payload: bytes):
    """REAL image decode for uncompressed 24-bit BMP — pure
    struct-parsing + numpy, zero codec dependencies, so at least one
    image format decodes for real in this environment (PIL/av-backed
    formats stay stubbed behind ``decode_image``).

    Returns an ``H x W x 3`` uint8 RGB array. Supports the standard
    BITMAPINFOHEADER layout: bottom-up (positive height) and top-down
    (negative height) row order, 4-byte row padding, BGR channel
    order. Raises ``ValueError`` for non-BMP bytes and
    ``NotImplementedError`` for compressed / non-24-bit variants.
    """
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    h, w = abs(height), width
    if w <= 0 or h <= 0:
        raise ValueError("degenerate BMP dimensions")
    stride = (w * 3 + 3) & ~3
    need = pixel_off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    data = np.frombuffer(payload, np.uint8, count=stride * h, offset=pixel_off)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int):
    """Invert PNG per-scanline filtering (spec §6: None/Sub/Up/
    Average/Paeth). Up/None rows are vectorized; Sub/Average/Paeth
    carry a left-neighbor dependence, so those rows walk pixels with
    the channel vector done by numpy — per-payload work inside an
    Arrow batch, never per-row Python in a Spark plan."""
    import numpy as np

    rowlen = stride + 1
    if len(raw) < rowlen * height:
        raise ValueError("PNG: truncated scanline data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[y * rowlen]
        cur = np.frombuffer(
            raw, np.uint8, stride, offset=y * rowlen + 1
        ).astype(np.int32)
        if ftype == 0:
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):
            rec = np.empty(stride, dtype=np.int32)
            for x in range(0, stride, bpp):
                a = rec[x - bpp: x] if x >= bpp else np.zeros(bpp, np.int32)
                b = prev[x: x + bpp]
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = (
                        prev[x - bpp: x]
                        if x >= bpp
                        else np.zeros(bpp, np.int32)
                    )
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                rec[x: x + bpp] = (cur[x: x + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: invalid filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def decode_png(payload: bytes):
    """REAL image decode for 8-bit non-interlaced truecolor PNG
    (color types 2 = RGB and 6 = RGBA) — pure stdlib ``zlib`` +
    struct parsing + numpy unfiltering, zero codec dependencies,
    so the dominant web/corpus image container decodes for real in
    this environment (JPEG/GIF/WebP stay behind the PIL gate).

    Returns an ``H x W x 3`` uint8 RGB array (RGBA's alpha is
    dropped, matching PIL's ``convert("RGB")`` on the same path).
    Chunk CRCs are verified and the decompressed scanline length is
    checked — corrupt payloads raise ``ValueError`` (they become
    ``decode_error`` DATA rows in the stats operators, never job
    failures). ``NotImplementedError`` for bit depths != 8, palette/
    gray color types, and Adam7 interlacing — honest limits, not
    silent wrong pixels.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(payload):
            raise ValueError("PNG: truncated chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: invalid compression/filter method")
    if interlace != 0:
        raise NotImplementedError("PNG: Adam7 interlacing not supported")
    if depth != 8 or color not in (2, 6):
        raise NotImplementedError(
            f"PNG: only 8-bit RGB/RGBA supported (depth={depth}, "
            f"color_type={color})"
        )
    if width <= 0 or height <= 0:
        raise ValueError("PNG: degenerate dimensions")
    channels = 3 if color == 2 else 4
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG: corrupt IDAT stream ({exc})")
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG: scanline length mismatch")
    px = _png_unfilter(raw, height, stride, channels).reshape(
        height, width, channels
    )
    return np.ascontiguousarray(px[:, :, :3])


def encode_png(arr) -> bytes:
    """Minimal stdlib PNG encoder (8-bit RGB/RGBA, non-interlaced) —
    the write side of the plumbing and the fixture generator for the
    decode oracle. Deterministic bytes: per-scanline filter type is
    ``y % 5``, deliberately cycling through ALL five spec filters so
    a round-trip exercises every unfilter branch; zlib level 6."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("encode_png expects an H x W x 3|4 uint8 array")
    h, w, channels = a.shape
    color = 2 if channels == 3 else 6
    bpp = channels
    lines = []
    prev = np.zeros((w, channels), dtype=np.int32)
    for y in range(h):
        cur = a[y].astype(np.int32)
        ftype = y % 5
        left = np.vstack([np.zeros((1, channels), np.int32), cur[:-1]])
        upleft = np.vstack([np.zeros((1, channels), np.int32), prev[:-1]])
        if ftype == 0:
            out = cur
        elif ftype == 1:
            out = cur - left
        elif ftype == 2:
            out = cur - prev
        elif ftype == 3:
            out = cur - ((left + prev) >> 1)
        else:
            p = left + prev - upleft
            pa = abs(p - left)
            pb = abs(p - prev)
            pc = abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            out = cur - pred
        lines.append(bytes([ftype]) + (out & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    body = zlib.compress(b"".join(lines), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


def synthetic_png_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    corrupt_every: int | None = None,
) -> DataFrame:
    """Deterministic PNG corpus for decode verification: document k
    becomes a ``W x H`` image with ``W = 8 + k % 17``,
    ``H = 8 + k % 13``, pixel ``(x, y)`` channel ``c`` valued
    ``(7k + 13x + 31y + 97c) % 256`` — a formula ANY engine can
    aggregate analytically, which is what lets a SQL oracle verify a
    binary decode bit-for-bit. Even ``k`` encodes as RGBA (the alpha
    plane is ``(k + x + y) % 256`` and must be DROPPED by the
    decoder); odd ``k`` as RGB. ``corrupt_every=m`` truncates every
    m-th document's payload to 25 bytes — a corrupt member that must
    surface as a ``decode_error`` data row, never a job failure.
    Output: ``(doc_id, payload binary)`` via one Arrow-batched
    ``mapInPandas`` (same plumbing as the real corpus writers)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for k in pdf[id_col].tolist():
                k = int(k)
                w, h = 8 + k % 17, 8 + k % 13
                channels = 4 if k % 2 == 0 else 3
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                img = ((7 * k + 13 * x + 31 * y + 97 * c) % 256).astype(
                    np.uint8
                )
                if channels == 4:
                    alpha = (
                        (k + x[:, :, :1] + y[:, :, :1]) % 256
                    ).astype(np.uint8)
                    img = np.concatenate([img, alpha], axis=2)
                payload = encode_png(img)
                if corrupt_every and k % corrupt_every == 0:
                    payload = payload[:25]
                ids.append(k)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary"
    )


def decode_image_any(payload: bytes):
    """Magic-sniffing image decode behind ONE contract: returns an
    ``H x W x 3`` uint8 RGB array for any supported container.
    BMP routes to the dependency-free :func:`decode_bmp` (always
    available, byte-identical results in every environment — the
    q96 oracle rests on it); 8-bit truecolor PNG routes to the
    stdlib :func:`decode_png` (zlib + numpy unfiltering — real
    compressed decode with zero codec dependencies; q180's oracle
    rests on it); other PNGs, JPEG/GIF/WebP route to PIL when
    importable and raise ``NotImplementedError`` otherwise, so a
    production cluster with pillow installed decodes real corpora
    through the SAME mapInPandas operators without any schema or
    call-site change."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        try:
            return decode_png(payload)
        except NotImplementedError:
            if not _HAS_PIL:
                raise
    elif not _HAS_PIL:
        raise NotImplementedError(
            "compressed image decode requires PIL; install pillow"
        )
    import io

    import numpy as np
    from PIL import Image as _Image

    with _Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


def decode_audio_any(payload: bytes):
    """Magic-sniffing audio decode behind ONE contract: returns
    ``(samples, sample_rate)`` with samples ``n_frames x n_channels``
    int32. RIFF/WAVE PCM routes to the dependency-free
    :func:`decode_wav` (the q97 oracle rests on it); compressed
    containers (FLAC/OGG) — and PCM variants decode_wav rejects —
    route to soundfile when importable, ``NotImplementedError``
    otherwise."""
    is_wav = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    if is_wav:
        try:
            return decode_wav(payload)
        except NotImplementedError:
            if not _HAS_SOUNDFILE:
                raise
    elif not _HAS_SOUNDFILE:
        raise NotImplementedError(
            "compressed audio decode requires soundfile; install it"
        )
    import io

    import numpy as np
    import soundfile as sf

    data, rate = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
    return data.astype(np.int32), int(rate)


IMAGE_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, mean_rgb array<double>, "
    "decode_error string"
)


def image_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-image decode + basic stats over BMP payloads: (doc_id,
    width, height, mean_rgb, decode_error). Real decode via
    ``decode_bmp``; rows whose payload fails to decode carry the
    error string with NULL stats instead of failing the job (the
    standard large-corpus posture: corrupt members are data, not
    exceptions).

    Same Arrow-batched ``mapInPandas`` shape as ``extract_features``
    — bounded batches, no Python in any other stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, means, errs = [], [], [], []
            for payload in pdf[payload_col].tolist():
                try:
                    rgb = decode_image_any(bytes(payload))
                except (ValueError, NotImplementedError, struct.error, OSError) as exc:
                    widths.append(None)
                    heights.append(None)
                    means.append(None)
                    errs.append(str(exc))
                    continue
                h, w = rgb.shape[0], rgb.shape[1]
                widths.append(w)
                heights.append(h)
                means.append(rgb.reshape(-1, 3).mean(axis=0).tolist())
                errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "mean_rgb": means,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


def decode_wav(payload: bytes):
    """REAL audio decode for RIFF/WAVE PCM — pure struct-parsing +
    numpy, zero codec dependencies (the audio analog of
    ``decode_bmp``; compressed codecs stay stubbed).

    Returns ``(samples, sample_rate)`` where samples is an
    ``n_frames x n_channels`` int32 array (16-bit PCM widened; 8-bit
    PCM is unsigned per the spec and is centered to signed). Raises
    ``ValueError`` for non-WAV bytes and ``NotImplementedError`` for
    non-PCM encodings or other bit depths.
    """
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + csize]
        if len(body) != csize:
            raise ValueError("truncated chunk (declared size exceeds payload)")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk too short ({len(fmt)} < 16 bytes)")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_format != 1:
        raise NotImplementedError(f"only PCM supported (format={audio_format})")
    if bits == 16:
        samples = np.frombuffer(
            data, "<i2", count=len(data) // 2
        ).astype(np.int32)
    elif bits == 8:
        samples = np.frombuffer(data, np.uint8).astype(np.int32) - 128
    else:
        raise NotImplementedError(f"only 8/16-bit PCM supported (bits={bits})")
    if n_channels <= 0:
        raise ValueError("degenerate channel count")
    frames = samples.size // n_channels
    return samples[: frames * n_channels].reshape(frames, n_channels), sample_rate


AUDIO_STATS_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_frames bigint, "
    "sum_abs bigint, peak int, decode_error string"
)


def audio_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-clip decode + INTEGER-EXACT stats over PCM WAV payloads:
    (doc_id, sample_rate, n_channels, n_frames, sum_abs, peak,
    decode_error). sum_abs / peak are integer sums over the raw PCM
    values, so the q97 oracle reproduces them bit-for-bit — no float
    RMS in the contract (compute RMS downstream as
    ``sqrt(sum_sq/n)`` if needed). Corrupt payloads are data rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rates, chans, frames, sums, peaks, errs = [], [], [], [], [], []
            for payload in pdf[payload_col].tolist():
                try:
                    samples, rate = decode_audio_any(bytes(payload))
                except (ValueError, NotImplementedError, struct.error, OSError) as exc:
                    rates.append(None); chans.append(None)
                    frames.append(None); sums.append(None)
                    peaks.append(None); errs.append(str(exc))
                    continue
                a = np.abs(samples)
                rates.append(rate)
                chans.append(samples.shape[1])
                frames.append(samples.shape[0])
                sums.append(int(a.sum()))
                peaks.append(int(a.max()) if a.size else 0)
                errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_channels": pd.array(chans, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int64"),
                    "sum_abs": pd.array(sums, dtype="Int64"),
                    "peak": pd.array(peaks, dtype="Int32"),
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


def encode_wav(samples, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE 16-bit PCM encoder (the write side of
    :func:`decode_wav`): ``samples`` is ``n_frames x n_channels``
    int-like; values are clipped to int16 range (documented — the
    standard saturating PCM write). Deterministic bytes."""
    import struct

    import numpy as np

    a = np.asarray(samples)
    if a.ndim != 2:
        raise ValueError("encode_wav expects an n_frames x n_channels array")
    a = np.clip(a, -32768, 32767).astype("<i2")
    n_channels = a.shape[1]
    data = a.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


RESAMPLED_AUDIO_SCHEMA = (
    "doc_id bigint, payload binary, sample_rate int, n_frames bigint, "
    "decode_error string"
)


def resample_audio(
    df: DataFrame, factor: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL audio downsample — decode (:func:`decode_audio_any`:
    PCM WAV dependency-free; FLAC/OGG via soundfile where installed)
    → block-mean decimation by integer ``factor`` (a boxcar
    anti-alias: each output frame is ``floor(sum(block)/factor)``
    per channel, exact integer arithmetic, trailing partial block
    dropped) → re-encode as 16-bit PCM WAV at ``rate/factor``
    (floor). The decode-transform-encode loop runs on actual samples
    with zero codec dependencies — the audio twin of
    :func:`resize_image`, and analytically oracle-able for formula
    waveforms (q183). Corrupt payloads become ``decode_error`` DATA
    rows with NULL payload.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, rates, frames, errs = [], [], [], []
            for payload in pdf[payload_col].tolist():
                try:
                    samples, rate = decode_audio_any(bytes(payload))
                except (
                    ValueError,
                    NotImplementedError,
                    struct.error,
                    OSError,
                ) as exc:
                    payloads.append(None)
                    rates.append(None)
                    frames.append(None)
                    errs.append(str(exc))
                    continue
                n, c = samples.shape
                n_out = n // factor
                block = samples[: n_out * factor].reshape(n_out, factor, c)
                # floor division matches the oracle's integer // on
                # the non-negative-sum contract; numpy's // IS floor
                out = block.sum(axis=1, dtype=np.int64) // factor
                new_rate = rate // factor
                payloads.append(encode_wav(out, new_rate))
                rates.append(new_rate)
                frames.append(n_out)
                errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int64"),
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, schema=RESAMPLED_AUDIO_SCHEMA)


def synthetic_wav_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 32,
    sample_rate: int = 8000,
    corrupt_every: int | None = None,
) -> DataFrame:
    """Deterministic PCM WAV corpus for decode/resample verification
    (the audio twin of :func:`synthetic_png_corpus`): document k's
    mono clip has ``n_samples`` 16-bit samples valued
    ``(37k + 101i) % 4096`` — non-negative and analytic, so a SQL
    oracle replays every decoded (and block-decimated) sample
    exactly. ``corrupt_every=m`` truncates every m-th payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for k in pdf[id_col].tolist():
                k = int(k)
                i = np.arange(n_samples, dtype=np.int64)
                samples = ((37 * k + 101 * i) % 4096).reshape(-1, 1)
                payload = encode_wav(samples, sample_rate)
                if corrupt_every and k % corrupt_every == 0:
                    payload = payload[:30]
                ids.append(k)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary"
    )


_Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(frames, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Minimal YUV4MPEG2 (Y4M) encoder, monochrome (``Cmono``):
    ``frames`` is ``n_frames x H x W`` uint8 luma. Y4M is the
    standard UNCOMPRESSED video interchange container (what ffmpeg
    pipes rawvideo through) — stream header + ``FRAME`` markers +
    raw planes, fully parseable with stdlib bytes — so video gets a
    real decode path with zero codec dependencies, the same honest
    pattern as BMP/PNG/WAV."""
    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError("encode_y4m expects an n_frames x H x W array")
    n, h, w = a.shape
    header = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    ).encode()
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(a[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """REAL video decode for monochrome YUV4MPEG2 — pure bytes
    parsing + numpy, zero codec dependencies. Returns ``(frames
    n x H x W uint8, (fps_num, fps_den))``. ``ValueError`` for
    corrupt/truncated streams; ``NotImplementedError`` for chroma
    formats beyond ``Cmono`` (C420 et al. need real color handling —
    honest limit, not silently-wrong planes)."""
    import numpy as np

    if payload[:10] != _Y4M_MAGIC:
        raise ValueError("not a Y4M payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M: truncated stream header")
    width = height = None
    fps = (25, 1)
    colorspace = "C420"
    for token in payload[10:nl].split(b" "):
        if not token:
            continue
        tag, val = chr(token[0]), token[1:].decode("ascii", "replace")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, _, den = val.partition(":")
            fps = (int(num), int(den or 1))
        elif tag == "C":
            colorspace = "C" + val
    if not width or not height or width < 1 or height < 1:
        raise ValueError("Y4M: missing/degenerate dimensions")
    if colorspace.lower() != "cmono":
        raise NotImplementedError(
            f"Y4M: only Cmono supported (got {colorspace})"
        )
    frame_bytes = width * height
    pos, frames = nl + 1, []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("Y4M: corrupt FRAME marker")
        pos = fnl + 1
        if pos + frame_bytes > len(payload):
            raise ValueError("Y4M: truncated frame plane")
        frames.append(
            np.frombuffer(payload, np.uint8, frame_bytes, offset=pos)
            .reshape(height, width)
        )
        pos += frame_bytes
    if not frames:
        raise ValueError("Y4M: no frames")
    return np.stack(frames), fps


VIDEO_FRAME_STATS_SCHEMA = (
    "doc_id bigint, n_frames int, width int, height int, "
    "frame_idx int, mean_luma double, decode_error string"
)


def video_frame_stats(
    df: DataFrame, n_sample: int = 4, payload_col: str = "payload"
) -> DataFrame:
    """Real video decode + evenly-spaced frame sampling: decode the
    Y4M payload, pick ``n_sample`` frames at indices
    ``floor(i·n_frames/n_sample)`` (the integer mapping an analytic
    oracle can replay), and emit per-sampled-frame mean luma — the
    actual frame-extraction stage of a multimodal pipeline, replacing
    the byte-slice stand-in of :func:`frame_sample` for containers
    with an in-repo decoder. Corrupt payloads yield ONE
    ``decode_error`` data row. Same Arrow-batched ``mapInPandas``
    shape as the image/audio operators."""
    if n_sample < 1:
        raise ValueError("n_sample must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, ws, hs, idxs, lumas, errs = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    frames, _fps = decode_y4m(bytes(payload))
                except (ValueError, NotImplementedError) as exc:
                    ids.append(doc_id)
                    nf.append(None)
                    ws.append(None)
                    hs.append(None)
                    idxs.append(None)
                    lumas.append(None)
                    errs.append(str(exc))
                    continue
                n, h, w = frames.shape
                for i in range(n_sample):
                    fi = (i * n) // n_sample
                    ids.append(doc_id)
                    nf.append(n)
                    ws.append(w)
                    hs.append(h)
                    idxs.append(fi)
                    lumas.append(float(frames[fi].mean()))
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": pd.array(nf, dtype="Int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "mean_luma": lumas,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, schema=VIDEO_FRAME_STATS_SCHEMA)


def synthetic_y4m_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    corrupt_every: int | None = None,
) -> DataFrame:
    """Deterministic Y4M corpus (the video twin of the PNG/WAV
    corpora): document k gets ``3 + k % 5`` frames of ``W = 8 +
    k % 9`` x ``H = 4 + k % 7`` luma, pixel ``(t, y, x)`` valued
    ``(11k + 7t + 13x + 31y) % 256`` — analytic, so a SQL oracle
    replays every sampled frame's mean exactly. ``corrupt_every=m``
    truncates every m-th payload mid-frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for k in pdf[id_col].tolist():
                k = int(k)
                n, w, h = 3 + k % 5, 8 + k % 9, 4 + k % 7
                t, y, x = np.meshgrid(
                    np.arange(n), np.arange(h), np.arange(w), indexing="ij"
                )
                frames = (
                    (11 * k + 7 * t + 13 * x + 31 * y) % 256
                ).astype(np.uint8)
                payload = encode_y4m(frames)
                if corrupt_every and k % corrupt_every == 0:
                    payload = payload[: len(payload) - w * h // 2]
                ids.append(k)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary"
    )


def _sniff_image_format(b: bytes) -> str | None:
    """Container sniff by magic bytes — BMP decodes everywhere;
    the compressed formats decode when PIL is importable and
    surface a NotImplementedError data row otherwise."""
    if b[:2] == b"BM":
        return "bmp"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return "webp"
    return None


def _sniff_audio_format(b: bytes) -> str | None:
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:4] == b"fLaC":
        return "flac"
    if b[:4] == b"OggS":
        return "ogg"
    return None


MEDIA_STATS_SCHEMA = (
    "doc_id bigint, format string, ok boolean, "
    "width int, height int, mean_rgb array<double>, "
    "sample_rate int, n_channels int, n_frames bigint, "
    "sum_abs bigint, peak int, decode_error string"
)


def media_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Mixed-modality decode dispatch over one binary column: sniff
    each payload's container by magic bytes (``BM`` -> BMP image,
    PNG signature -> stdlib PNG, ``RIFF..WAVE`` -> PCM audio,
    ``YUV4MPEG2`` -> Y4M video, frame count in ``n_frames``), run the
    matching REAL decoder, and emit one unified row — image columns
    NULL for audio rows and vice versa, undecodable/unknown payloads
    carried as data with ``ok=false`` and the reason. The single-pass
    Arrow-batched shape means a heterogeneous corpus (the practical
    case: one ``documents``-style table holding every modality) costs
    one scan, not one scan per format.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf["doc_id"].tolist(), pdf[payload_col].tolist()
            ):
                b = bytes(payload) if payload is not None else b""
                base = {
                    "doc_id": doc_id, "format": None, "ok": False,
                    "width": None, "height": None, "mean_rgb": None,
                    "sample_rate": None, "n_channels": None,
                    "n_frames": None, "sum_abs": None, "peak": None,
                    "decode_error": None,
                }
                img_fmt = _sniff_image_format(b)
                aud_fmt = _sniff_audio_format(b)
                try:
                    if img_fmt is not None:
                        base["format"] = img_fmt
                        rgb = decode_image_any(b)
                        base.update(
                            ok=True,
                            width=rgb.shape[1], height=rgb.shape[0],
                            mean_rgb=rgb.reshape(-1, 3).mean(0).tolist(),
                        )
                    elif b[:10] == _Y4M_MAGIC:
                        base["format"] = "y4m"
                        frames, _fps = decode_y4m(b)
                        base.update(
                            ok=True,
                            width=frames.shape[2],
                            height=frames.shape[1],
                            n_frames=frames.shape[0],
                        )
                    elif aud_fmt is not None:
                        base["format"] = aud_fmt
                        import numpy as np

                        samples, rate = decode_audio_any(b)
                        a = np.abs(samples)
                        base.update(
                            ok=True,
                            sample_rate=rate,
                            n_channels=samples.shape[1],
                            n_frames=samples.shape[0],
                            sum_abs=int(a.sum()),
                            peak=int(a.max()) if a.size else 0,
                        )
                    else:
                        base["decode_error"] = "unknown container"
                except (
                    ValueError, NotImplementedError, struct.error, OSError
                ) as exc:
                    base["decode_error"] = str(exc)
                rows.append(base)
            out = pd.DataFrame(rows)
            for c, t in (
                ("width", "Int32"), ("height", "Int32"),
                ("sample_rate", "Int32"), ("n_channels", "Int32"),
                ("n_frames", "Int64"), ("sum_abs", "Int64"),
                ("peak", "Int32"),
            ):
                out[c] = pd.array(out[c], dtype=t)
            yield out

    return df.mapInPandas(run, schema=MEDIA_STATS_SCHEMA)
