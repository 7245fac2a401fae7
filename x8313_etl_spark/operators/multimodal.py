"""Multimodal column plumbing (task brief: image/audio/video as opaque
binary columns + typed metadata, processed with Arrow-batched Pandas
UDFs over mapInPandas).

The container ships no image/audio codecs, so the DECODE step is split:

- ``decode_media`` — the real decoder hook. Raises NotImplementedError
  with instructions; a deployment drops in PIL/ffmpeg there without
  touching any Spark plumbing.
- ``media_features`` — the Spark-side pipeline that IS real and tested:
  schema handling, Arrow batch iteration, per-batch vectorized work, and
  a deterministic byte-level feature extractor (size + md5 + md5-derived
  pseudo width/height) standing in for the codec. Because the features
  are pure functions of the bytes, the whole path is oracle-checkable
  against DuckDB SQL on the same bytes.

Scale notes: binary payloads ride in the same parquet row groups as the
metadata; mapInPandas streams Arrow batches so executor memory is
bounded by batch size (spark.sql.execution.arrow.maxRecordsPerBatch),
not file size — at 100 TB, tune that plus maxPartitionBytes so a
partition of large blobs still fits. Feature extraction is map-only.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: output schema of media_features — pin explicitly, UDF outputs are
#: never inferred.
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, "
    "content_md5 string, width int, height int"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str, modality: str = "image") -> DataFrame:
    """Build a multimodal table: (id, modality, content binary, meta).

    Fixtures have no real blobs, so content = utf-8 bytes of the text
    column — the plumbing (binary column, typed meta struct, batch
    shapes) is identical for real media.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.length(F.col(text_col)).cast("bigint").alias("n_chars_meta")
        ).alias("meta"),
    )


def decode_media(content: bytes, modality: str) -> dict[str, Any]:
    """Real decoder hook — wire PIL (image) / soundfile (audio) /
    pyav (video) here in a deployment. Deliberately NotImplemented in
    this container (no codec libraries); media_features uses the
    deterministic byte-level fallback instead."""
    raise NotImplementedError(
        f"no codec for modality={modality!r} in this environment; "
        "install PIL/soundfile/pyav and implement decode_media"
    )


def media_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Emits size, md5, and md5-derived pseudo dimensions (stand-ins for
    decoded width/height — same signature and batch shape a real decoder
    produces). Pure function of the bytes → DuckDB twin exists.
    """

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            digests = [
                hashlib.md5(bytes(c)).hexdigest() for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "content_md5": digests,
                    "width": [int(d[0:2], 16) % 64 + 16 for d in digests],
                    "height": [int(d[2:4], 16) % 64 + 16 for d in digests],
                }
            )

    return mm.mapInPandas(extract, schema=FEATURE_SCHEMA)
