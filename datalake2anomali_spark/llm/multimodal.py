"""Multimodal (binary) column plumbing.

Pattern for image/audio/video at 100 TB: media travels as an opaque
``binary`` column next to typed metadata; decode / feature-extraction runs
as Arrow-batched ``mapInPandas`` so each task processes a columnar batch
(no per-row Python overhead), and partitioning/schema stay fully relational.

This environment ships no codec libraries, so the actual decode is stubbed
(``decode_image`` raises ``NotImplementedError``); ``extract_features`` uses
a deterministic fake "decoder" (byte-length arithmetic + md5 checksum) so
the Spark-side plumbing — schema, batch shape, Arrow transfer — is real and
oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, checksum string"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of the text).

    In production this is the raw image/audio blob read from object storage;
    everything downstream treats it as bytes.
    """
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes) -> "object":
    """Real decode hook — requires an image codec library.

    STUB: Pillow/libjpeg are not available in this environment.  Swap this
    for ``PIL.Image.open(io.BytesIO(payload))`` where they are.
    """
    raise NotImplementedError("image codecs unavailable in this environment")


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The fake decode derives (width, height) from byte length and an md5
    checksum — deterministic, so the full mapInPandas path (Arrow out,
    pandas batch in, Arrow back) is verified against a SQL oracle.
    """

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.str.len().astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        features, FEATURE_SCHEMA
    )


RESIZED_SCHEMA = "doc_id long, payload binary, n_bytes int, fake_width int, fake_height int"


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """Real resize hook — requires an image codec library.

    STUB: swap for ``PIL.Image.open(...).resize((width, height))`` where
    Pillow exists; the deterministic fake below (truncate/cycle bytes to the
    target "pixel count") keeps the batch plumbing testable without codecs.
    """
    target = width * height
    if len(payload) >= target:
        return payload[:target]
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]


def resize_images(docs_with_payload: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Binary→binary transform batch-wise: the resize plumbing shape.

    Output payload is exactly ``width*height`` bytes per row, so downstream
    batch memory is bounded and predictable — the property a real resize
    gives you before feature extraction or model inference.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda p: resize_image_stub(p, width, height))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_bytes": out.str.len().astype("int32"),
                    "fake_width": width,
                    "fake_height": height,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_checksum string"


def sample_frames(
    docs_with_payload: DataFrame, frame_bytes: int = 256, every: int = 4
) -> DataFrame:
    """Video-style frame sampling: 1 input row → N output rows, batched.

    Treats the payload as a sequence of fixed-size ``frame_bytes`` frames
    (a real decoder would use container timestamps) and keeps every
    ``every``-th frame.  The 1→N fan-out happens inside ``mapInPandas`` so
    the expansion never materializes per-row Python objects on the driver
    and output batch size stays bounded by the input Arrow batch.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, blobs, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(fi)
                    blobs.append(chunk)
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": blobs, "frame_checksum": sums}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(frames, FRAME_SCHEMA)


AUDIO_SCHEMA = "doc_id long, n_samples int, mean_amp double, rms double"


def audio_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Waveform statistics with the payload read as 16-bit little-endian PCM.

    A real pipeline decodes the container first (STUB — no audio codecs
    here); interpreting raw bytes as PCM keeps the numeric path (numpy over
    Arrow batches, one vectorized pass per batch) identical to production.
    """
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n, mean_a, rms = [], [], []
            for payload in pdf["payload"]:
                x = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2").astype(np.float64)
                n.append(len(x))
                mean_a.append(float(x.mean()) if len(x) else 0.0)
                rms.append(float(np.sqrt((x * x).mean())) if len(x) else 0.0)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_samples": n, "mean_amp": mean_a, "rms": rms}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(stats, AUDIO_SCHEMA)
