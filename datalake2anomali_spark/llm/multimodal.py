"""Multimodal (binary) column plumbing.

Pattern for image/audio/video at 100 TB: media travels as an opaque
``binary`` column next to typed metadata; decode / feature-extraction runs
as Arrow-batched ``mapInPandas`` so each task processes a columnar batch
(no per-row Python overhead), and partitioning/schema stay fully relational.

This environment ships no codec *libraries* (no Pillow/libjpeg), so
compressed formats stay out of reach — but :func:`decode_image` is a real
stdlib-only decoder for the uncompressed formats (binary PPM/PGM, BMP),
and the registered pipeline exercises it end-to-end: synthesize a PPM blob
per document, decode it back with the real header parser, and
oracle-check the decoded width/height/pixel checksum.  ``extract_features``
keeps the deterministic byte-arithmetic fake as the schema-shape demo for
formats a codec library would handle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import NamedTuple

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


class DecodedImage(NamedTuple):
    width: int
    height: int
    mode: str  # "RGB" or "L"
    pixels: bytes  # top-down, RGB byte triples or single luma bytes


def _decode_pnm(payload: bytes) -> DecodedImage:
    """Binary PPM (P6, RGB) / PGM (P5, grayscale) — netpbm spec: ASCII
    header tokens (magic, width, height, maxval) with ``#`` comments, one
    whitespace byte, then the raster."""
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header and raster
    width, height, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PNM maxval {maxval} (16-bit samples)")
    channels = 3 if payload[:2] == b"P6" else 1
    need = width * height * channels
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(f"PNM raster truncated: need {need}, have {len(raster)}")
    return DecodedImage(width, height, "RGB" if channels == 3 else "L", bytes(raster))


def _decode_bmp(payload: bytes) -> DecodedImage:
    """Uncompressed (BI_RGB) 24-bit BMP with a BITMAPINFOHEADER: rows are
    4-byte aligned, stored bottom-up (or top-down when height < 0), samples
    are BGR — normalized here to top-down RGB."""
    import struct

    if len(payload) < 54:
        raise ValueError("BMP header truncated")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    if compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if len(payload) < data_off + stride * height:
        raise ValueError("BMP pixel data truncated")
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = data_off + src_row * stride
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            dst = (row * width + x) * 3
            out[dst : dst + 3] = bytes((r, g, b))
    return DecodedImage(width, height, "RGB", bytes(out))


def decode_image(payload: bytes) -> DecodedImage:
    """Decode an uncompressed image payload — pure stdlib, no codec libs.

    Supports binary PPM (P6) / PGM (P5) and 24-bit uncompressed BMP.
    Compressed formats (JPEG/PNG/...) need a codec library: swap this for
    ``PIL.Image.open(io.BytesIO(payload))`` where Pillow exists; the
    DataFrame-level plumbing (:func:`decode_features`) is format-agnostic.
    """
    magic = bytes(payload[:2])
    if magic in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if magic == b"BM":
        return _decode_bmp(payload)
    raise ValueError(f"unsupported image magic {magic!r} (stdlib decoder: PPM/PGM/BMP)")


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6) encoder — the round-trip twin of :func:`decode_image`."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def synth_ppm_payload(seed: bytes) -> bytes:
    """Deterministic real PPM image derived from arbitrary seed bytes:
    dimensions from the seed length (w = n%16+1, h = n%12+1), pixels the
    seed cycled to 3·w·h bytes.  Stands in for reading a real image blob
    from object storage; the output is a VALID image the real decoder
    round-trips."""
    n = len(seed)
    if n == 0:
        raise ValueError("empty seed")
    w, h = n % 16 + 1, n % 12 + 1
    need = 3 * w * h
    reps = (need + n - 1) // n
    return encode_ppm(w, h, (seed * reps)[:need])


DECODED_SCHEMA = "doc_id long, n_pixels int, width int, height int, pixel_checksum string"


def synthesize_ppm_images(docs_with_payload: DataFrame) -> DataFrame:
    """binary→binary batch transform: wrap each payload into a real PPM."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf["payload"].map(synth_ppm_payload)}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        synth, "doc_id long, payload binary"
    )


def decode_features(images: DataFrame) -> DataFrame:
    """REAL decode over the binary column: parse each payload with
    :func:`decode_image` (header fields, raster bounds) and emit decoded
    width/height/pixel stats — Arrow-batched, one Python pass per batch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, npix, ws, hs, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(payload)
                ids.append(doc_id)
                npix.append(img.width * img.height)
                ws.append(img.width)
                hs.append(img.height)
                sums.append(hashlib.md5(img.pixels).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_pixels": pd.array(npix, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "pixel_checksum": sums,
                }
            )

    return images.select("doc_id", "payload").mapInPandas(decode, DECODED_SCHEMA)


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


def encode_pgm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PGM (P5) encoder — grayscale twin of :func:`encode_ppm`."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} luma bytes, got {len(pixels)}")
    return b"P5\n%d %d\n255\n" % (width, height) + pixels


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize over a decodable payload (PPM/PGM/BMP).

    Decode → pick source rows/cols with the floor mapping
    ``src = dst * src_dim // dst_dim`` (one vectorized numpy gather, no
    per-pixel Python) → re-encode in the decoded mode.  Deterministic and
    engine-independent, so the resized raster is oracle-checkable.
    """
    import numpy as np

    img = decode_image(payload)
    ch = 3 if img.mode == "RGB" else 1
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(img.height, img.width, ch)
    rows = (np.arange(height) * img.height) // height
    cols = (np.arange(width) * img.width) // width
    out = arr[rows][:, cols].tobytes()
    if ch == 3:
        return encode_ppm(width, height, out)
    return encode_pgm(width, height, out)


def resize_decoded_images(images: DataFrame, width: int, height: int) -> DataFrame:
    """binary→binary batch resize through the real decoder.

    Output payloads are valid images of exactly (width, height) — bounded,
    predictable batch memory for downstream feature extraction/inference.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(
                        lambda p: resize_image(p, width, height)
                    ),
                }
            )

    return images.select("doc_id", "payload").mapInPandas(
        resize, "doc_id long, payload binary"
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


WAV_FRAMERATE = 16000


def synth_wav_payload(seed: bytes, framerate: int = WAV_FRAMERATE) -> bytes:
    """Deterministic REAL mono 16-bit WAV container from arbitrary seed
    bytes: each byte b becomes the PCM sample (b − 128)·256.  The output is
    a genuine RIFF/WAVE file the stdlib ``wave`` reader parses — the audio
    analog of :func:`synth_ppm_payload`."""
    import io
    import wave

    import numpy as np

    if not seed:
        raise ValueError("empty seed")
    samples = (np.frombuffer(seed, dtype=np.uint8).astype(np.int16) - 128) * 256
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synthesize_wav_audio(docs_with_payload: DataFrame) -> DataFrame:
    """binary→binary batch transform: wrap each payload into a real WAV."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf["payload"].map(synth_wav_payload)}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        synth, "doc_id long, payload binary"
    )


WAV_STATS_SCHEMA = (
    "doc_id long, n_samples int, framerate int, n_channels int, "
    "amp_sum long, amp_sqsum long"
)


def decode_wav_stats(audio: DataFrame) -> DataFrame:
    """REAL WAV container decode (stdlib ``wave``: RIFF header, fmt chunk,
    frame count) + exact integer amplitude stats per payload.

    Sums are int64 — exact in any summation order and engine, which is what
    lets a SQL oracle certify the decode down to every sample value."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            ids, ns, frs, chs, sums, sqs = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("only 16-bit PCM supported")
                    x = np.frombuffer(
                        w.readframes(w.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                    ids.append(doc_id)
                    ns.append(len(x))
                    frs.append(w.getframerate())
                    chs.append(w.getnchannels())
                    sums.append(int(x.sum()))
                    sqs.append(int((x * x).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": pd.array(ns, dtype="int32"),
                    "framerate": pd.array(frs, dtype="int32"),
                    "n_channels": pd.array(chs, dtype="int32"),
                    "amp_sum": pd.array(sums, dtype="int64"),
                    "amp_sqsum": pd.array(sqs, dtype="int64"),
                }
            )

    return audio.select("doc_id", "payload").mapInPandas(stats, WAV_STATS_SCHEMA)


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
