"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (byte stats standing in for pixel decoding) — but the
Spark plumbing is the real thing a multimodal pipeline needs and is fully
exercised: a binary column, an Arrow-batched ``mapInPandas`` decoder with
an explicit output schema, and partition-friendly batch shapes. Swapping
``_decode_batch`` for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (UTF-8 bytes of text, standing in
    for an image/audio blob) plus typed metadata columns."""
    shuffle_n = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return docs.repartition(shuffle_n, F.col("doc_id")).select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder (REAL codec would go here; see module
    docstring). Pure-Python byte math per Arrow batch — no row-at-a-time
    serialization."""
    import numpy as np
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        checksum = payloads.map(
            lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()))
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            "checksum": checksum.astype("int64"),
            "width": (checksum % 640 + 1).astype("int32"),
            "height": (checksum // 640 % 480 + 1).astype("int32"),
        })


def decode_payloads(with_payload: DataFrame) -> DataFrame:
    """Run the stub decoder via mapInPandas (Arrow batch transfer)."""
    return with_payload.mapInPandas(_decode_batch, schema=DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_bytes", T.IntegerType()),
    T.StructField("frame_checksum", T.LongType()),
])

N_FRAMES = 4


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake frame sampler (a REAL video codec would seek
    keyframes here): split each payload into N_FRAMES even byte slices
    (remainder to the last frame) and emit one row per frame with its
    byte checksum — the explode-shaped output every frame-level feature
    extractor needs."""
    import numpy as np
    for pdf in batches:
        ids, idxs, sizes, sums = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            flen = len(arr) // N_FRAMES
            for k in range(N_FRAMES):
                lo = k * flen
                hi = (k + 1) * flen if k < N_FRAMES - 1 else len(arr)
                ids.append(doc_id)
                idxs.append(k)
                sizes.append(hi - lo)
                sums.append(int(arr[lo:hi].sum()))
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                            "frame_bytes": sizes, "frame_checksum": sums})


def frame_sample(with_payload: DataFrame) -> DataFrame:
    """Per-frame rows from binary payloads via mapInPandas."""
    return with_payload.mapInPandas(_frame_sample_batch, schema=FRAME_SCHEMA)
