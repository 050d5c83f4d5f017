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
