"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched ``mapInPandas`` stages.

The Spark-side design is the real deliverable: binary columns travel as
``BinaryType`` with a metadata struct alongside; decoding happens in
``mapInPandas`` so each Arrow batch is processed vectorized in Python
and oversized rows never materialize on the driver. Actual image/audio
codecs are NOT available in this environment, so the codec call is
isolated behind ``decode_image_real`` (raises NotImplementedError) and
the deterministic ``fake_decode_meta`` below exercises the identical
plumbing — schema contract, batch iteration, partitioning — with
oracle-checkable output.

At 100 TB: payloads should be read through ``spark.read.format
("binaryFile")`` or parquet binary columns with
``spark.sql.parquet.columnarReaderBatchSize`` tuned down (large cells),
and partitioned so a single batch stays << executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Metadata schema accompanying every payload column.
META_FIELDS = "modality string, byte_len long, encoding string"


def attach_payload(df: DataFrame, text_col: str = "text", modality: str = "text") -> DataFrame:
    """Wrap a column as (payload: binary, meta: struct) — the canonical
    multimodal row shape. Here the payload is the utf-8 encoding of the
    text column (the container has no binary media); real pipelines load
    bytes via binaryFile/parquet."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.lit("utf-8").alias("encoding"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_image_real(payload_bytes: bytes) -> dict:
    """Real codec hook (PIL/libvips/ffmpeg live here in production).

    The container ships no media libraries, so this is an explicit stub —
    the mapInPandas plumbing around it is real and tested via
    :func:`fake_decode_meta`.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_decode_meta for plumbing tests"
    )


#: Resize target box (the usual vision-model input side).
RESIZE_BOX = 224
#: Keep every k-th frame when sampling.
FRAME_STRIDE = 2


def fake_decode_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in decoder + the downstream feature stages a
    media pipeline runs, all via mapInPandas over Arrow batches:

    - decode:      width  = 64 + byte_len % 193   (pseudo-dimensions)
                   height = 64 + byte_len % 149
                   n_frames = 1 + byte_len % 7
    - resize:      fit into a 224-box preserving aspect ratio, integer
                   math only (w*224 // max(w,h)) so every engine agrees
    - frame-sample: keep every 2nd frame index (0,2,4,...)

    Being arithmetic on octet_length, the whole operator is reproducible
    in ANSI SQL — so even the UDF *plumbing* is oracle-checked. A real
    pipeline swaps the arithmetic for PIL/ffmpeg calls inside the same
    batch iterator (see decode_image_real); the Spark-side contract —
    schema, Arrow batching, partitioning — is identical.
    """
    schema = (
        f"{id_col} long, byte_len long, width long, height long, n_frames long, "
        f"resized_w long, resized_h long, sampled_frames string"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            w = 64 + n % 193
            h = 64 + n % 149
            frames = 1 + n % 7
            longest = pd.concat([w, h], axis=1).max(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": n,
                    "width": w,
                    "height": h,
                    "n_frames": frames,
                    "resized_w": (w * RESIZE_BOX) // longest,
                    "resized_h": (h * RESIZE_BOX) // longest,
                    "sampled_frames": frames.map(
                        lambda k: ",".join(str(i) for i in range(0, k, FRAME_STRIDE))
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, schema)
