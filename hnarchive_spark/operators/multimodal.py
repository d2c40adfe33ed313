"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched Pandas iterators.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBS (deterministic fakes clearly marked below); everything
Spark-side is real and load-bearing:

* schema: ``payload binary`` + ``media_meta struct<mime,byte_len>``;
* execution: ``mapInPandas`` — payloads cross to Python as Arrow binary
  batches (zero-copy), never row-at-a-time;
* batch shape: honors ``spark.sql.execution.arrow.maxRecordsPerBatch``;
* partitioning: per-row kernels preserve partitioning, no shuffle.

Swapping the stub for a real decoder (PIL/ffmpeg/torchaudio) changes ONLY
the function body — the Spark plumbing, schema, and batching stay as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Treat the utf-8 bytes of a text column as an opaque media payload with
    typed metadata — the storage shape a real image/audio table would have."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
        ).alias("media_meta"),
    )


def _decode_stub(buf: bytes) -> tuple[int, int, int, int]:
    """STUB decoder — deterministic fake in place of a real media decoder.

    A production build would do ``PIL.Image.open(io.BytesIO(buf))`` /
    ffmpeg frame sampling here; this container has neither, so dimensions
    are derived arithmetically from the payload length (stable, testable).
    """
    n = len(buf)
    return n, n % 640, (n * 7) % 480, n % 30 + 1


def decode_media(df: DataFrame) -> DataFrame:
    """payload/meta rows -> decoded metadata via Arrow-batched mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_stub(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "byte_len": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "n_frames": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(kernel, DECODED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling: one output row per (stub-)decoded frame, carrying the
    sliced payload bytes. A real video kernel would seek+decode per frame;
    the stub slices the payload at fixed strides — the Spark shape (row
    explosion inside the Arrow kernel, binary slices in the output batch)
    is exactly the production one."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_len": [], "frame_bytes": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                n, _, _, n_frames = _decode_stub(buf)
                stride = n // n_frames
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * stride)
                    out["frame_len"].append(stride)
                    out["frame_bytes"].append(bytes(buf[i * stride : i * stride + stride]))
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, FRAMES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("target_w", LongType()),
        StructField("target_h", LongType()),
        StructField("resized_bytes", BinaryType()),
    ]
)


def resize_media(df: DataFrame, target_w: int = 64, target_h: int = 48) -> DataFrame:
    """Resize kernel: decode dims (stub), emit a payload downsampled to the
    target size. The stub 'resample' strides the byte buffer to
    target_w*target_h bytes — a real kernel swaps in PIL/cv2 resampling;
    schema, batching, and the binary output path are the production shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "target_w": [],
                   "target_h": [], "resized_bytes": []}
            n_target = target_w * target_h
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                n, w, h, _ = _decode_stub(b)
                stride = max(1, n // n_target)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["target_w"].append(target_w)
                out["target_h"].append(target_h)
                out["resized_bytes"].append(b[::stride][:n_target])
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, RESIZED_SCHEMA)


N_FEATURE_BINS = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dim", LongType()),
        StructField("value", LongType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction: byte-value histogram (mod-8 bins) per payload via
    numpy inside the Arrow kernel — the stand-in for an image/audio
    embedding model. Output is the exploded (doc_id, dim, value) form so
    downstream joins/aggregations stay columnar."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dims, vals = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr % N_FEATURE_BINS, minlength=N_FEATURE_BINS)
                ids.extend([doc_id] * N_FEATURE_BINS)
                dims.extend(range(N_FEATURE_BINS))
                vals.extend(int(x) for x in hist)
            yield pd.DataFrame({"doc_id": ids, "dim": dims, "value": vals})

    return df.mapInPandas(kernel, FEATURES_SCHEMA)


PHASH_TILES = 32  # perceptual-hash width in bits (one bit per byte tile)

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash(df: DataFrame) -> DataFrame:
    """Tile-mean perceptual hash of the binary payload via the Arrow kernel.

    The payload is split into ``PHASH_TILES`` contiguous byte tiles; bit j
    is set iff tile j's byte-sum strictly exceeds the payload-wide mean
    (cross-multiplied to the pure-integer test ``tile_sum * n_tiles >
    total_sum`` so there is no division anywhere) — the aHash recipe a real
    image pipeline applies to an 8x8 downsample, applied here to the stub
    payload so the full Spark path (binary batch in, 64-bit signature out)
    is load-bearing. Vectorized with ``np.add.reduceat`` per payload."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64)
                n = len(arr)
                starts = [(j * n) // PHASH_TILES for j in range(PHASH_TILES)]
                # reduceat misreads an empty trailing tile (start == n), so
                # guard tiny payloads by summing per-slice instead
                if n >= PHASH_TILES:
                    sums = np.add.reduceat(arr, starts)
                else:
                    ends = starts[1:] + [n]
                    sums = np.array(
                        [arr[a:b].sum() for a, b in zip(starts, ends)], dtype=np.int64
                    )
                total = int(arr.sum())
                h = 0
                for j, ts in enumerate(sums):
                    if int(ts) * PHASH_TILES > total:
                        h |= 1 << j
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return df.mapInPandas(kernel, PHASH_SCHEMA)
