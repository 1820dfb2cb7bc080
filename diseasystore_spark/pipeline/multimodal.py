"""Multimodal column handling: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a typed
metadata struct alongside (``modality``, ``format``, byte length). The
Spark-side plumbing — schema, partition sizing, Arrow-batched
``mapInPandas`` signatures — is real and tested; the *decode* step is
stubbed because codec libraries (PIL / torchaudio / av) are not in
this environment. Each stub either raises ``NotImplementedError`` or
computes a deterministic fake feature (clearly marked), so swapping in
a real decoder changes one function body, not the pipeline shape.

Scale notes: binary rows are large — keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a partition
of images fits executor memory, and prefer ``mapInPandas`` (streaming
batch iterator) over ``collect``-style UDFs so each Arrow batch is
bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F



try:  # real decoders are optional; everything degrades to stubs
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

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
