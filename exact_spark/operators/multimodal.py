"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (project north star).

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual media decode is stubbed behind
an import-try (decode libraries are not in this container) with a
deterministic fake, clearly marked, per the build contract.

Payloads here are synthesized from ``documents.text`` (utf-8 bytes) so the
binary path is exercised end-to-end on the driver's tables.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exact_spark import io
from exact_spark.registry import register
from exact_spark.session import tune_session

try:  # decode libs absent in this environment — plumbing stays real
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def with_binary_payload(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Attach the opaque payload + typed metadata columns (the multimodal
    table schema: payload BINARY, meta STRUCT<kind, mime, n_bytes>)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(f"application/x-fake-{kind}").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode / feature-extract over binary payloads via mapInPandas.

    Real decode (PIL etc.) is NOT available here; the stub derives
    deterministic pseudo-features (crc32-seeded dims, exact byte entropy)
    so the Arrow batch shape, schema, and partitioning behavior are the
    ones a real decoder would see. Swap ``_decode_batch`` for the real
    thing when the codec libraries exist.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("byte_entropy", T.DoubleType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if _HAVE_PIL:  # pragma: no cover - not in this container
                    raise NotImplementedError("real image decode: wire PIL here")
                # STUB: deterministic fake decode
                counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
                p = counts[counts > 0] / len(b)
                entropy = float(-(p * np.log2(p)).sum()) if len(b) else 0.0
                h = zlib.crc32(b)
                rows.append(
                    (int(doc_id), len(b), entropy, 16 + h % 64, 16 + (h >> 8) % 64,
                     1 + (h >> 16) % 8)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "byte_entropy", "width",
                               "height", "n_frames"]
            )

    return df.select("doc_id", "payload").mapInPandas(_decode_batch, schema=schema)


@register(
    "multimodal_binary_meta",
    sql="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="Multimodal table plumbing: opaque binary payload sizing + content "
    "hash — the metadata path is plain column ops, oracle-checked.",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = io.load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(F.col("text")).alias("payload_md5"),
    )


@register(
    "multimodal_decode_features",
    sql=None,  # pandas-UDF decode path -> rows-only check
    doc="Binary decode/feature-extract via Arrow-batched mapInPandas "
    "(deterministic stub decoder; real codec wires into _decode_batch).",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = io.load(spark, sf_dir, "documents")
    return decode_features(with_binary_payload(docs))
