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


def decode_image_any(payload: bytes):
    """Magic-sniffing image decode behind ONE contract: returns an
    ``H x W x 3`` uint8 RGB array for any supported container.
    BMP routes to the dependency-free :func:`decode_bmp` (always
    available, byte-identical results in every environment — the
    q96 oracle rests on it); JPEG/PNG/GIF/WebP route to PIL when
    importable and raise ``NotImplementedError`` otherwise, so a
    production cluster with pillow installed decodes real corpora
    through the SAME mapInPandas operators without any schema or
    call-site change."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if not _HAS_PIL:
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
    ``RIFF..WAVE`` -> PCM audio), run the matching REAL decoder, and
    emit one unified row — image columns NULL for audio rows and vice
    versa, undecodable/unknown payloads carried as data with
    ``ok=false`` and the reason. The single-pass Arrow-batched shape
    means a heterogeneous corpus (the practical case: one
    ``documents``-style table holding every modality) costs one scan,
    not one scan per format.
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
