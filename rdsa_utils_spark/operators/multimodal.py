"""Multimodal (binary) column operators for training-data pipelines.

No reference equivalent (extension surface). Media payloads are
opaque ``binary`` columns with typed metadata structs; the engine's
job is the Spark-side plumbing — schemas, Arrow batch shape,
partition sizing — while actual codecs plug in per deployment.

Decode/resize/frame-sample run through ``mapInPandas`` (Arrow batch
iterator): one Python worker per partition, zero-copy binary
buffers. The image/audio libraries are NOT in this container, so the
codec step is stubbed two ways:
- ``decode_stub="deterministic"`` (default): a fake, fully
  deterministic decoder that derives metadata from the byte stream —
  real plumbing, testable end-to-end.
- ``decode_stub="raise"``: the production placeholder that raises
  ``NotImplementedError`` with instructions to plug a codec in.

Scale notes: binary rows are large — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition's
decoded batch fits executor memory, and prefer
``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned down (e.g.
256) for >1 MB payloads.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "n_bytes long, format string, width int, height int, n_channels int"
)


def attach_binary_payload(
    df: DataFrame,
    source_col: str,
    out_col: str = "payload",
    charset: str = "UTF-8",
) -> DataFrame:
    """Materialize a binary column from a string column (test/demo
    path — real pipelines read binary straight from parquet/object
    storage)."""
    return df.withColumn(out_col, F.encode(F.col(source_col), charset))


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: metadata derived
    purely from payload bytes, so results are reproducible anywhere."""
    n = len(payload)
    return {
        "n_bytes": n,
        "format": "fake/raw",
        "width": n % 640,
        "height": (n // 640) % 480,
        "n_channels": 3,
    }


def extract_image_metadata(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    decode_stub: str = "deterministic",
    decoder: Optional[Callable[[bytes], dict]] = None,
) -> DataFrame:
    """Decode metadata for each binary payload via mapInPandas.

    ``decoder`` overrides the stub with a real codec (e.g. PIL-based)
    taking bytes → dict matching IMAGE_META_SCHEMA.
    """
    if decoder is None:
        if decode_stub == "raise":
            def decoder(_: bytes) -> dict:
                raise NotImplementedError(
                    "No image codec in this environment. Pass decoder= with a "
                    "callable(bytes) -> {n_bytes, format, width, height, n_channels}.",
                )
        elif decode_stub == "deterministic":
            decoder = _fake_decode
        else:
            raise ValueError("decode_stub must be 'deterministic' or 'raise'")

    out_schema = f"{id_col} long, {IMAGE_META_SCHEMA}"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decoder(b) for b in pdf[binary_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, binary_col).mapInPandas(_batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    frame_stride: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame-sample' a binary payload: emit one row per sampled chunk
    (the video-frame-sampling plumbing, with byte-chunking standing in
    for a real demuxer). Output: (id, frame_idx, frame_bytes)."""
    out_schema = f"{id_col} long, frame_idx int, frame_bytes binary"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for pid, payload in zip(pdf[id_col], pdf[binary_col]):
                for i in range(min(max_frames, max(1, len(payload) // frame_stride))):
                    ids.append(pid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * frame_stride:(i + 1) * frame_stride]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.select(id_col, binary_col).mapInPandas(_batches, schema=out_schema)
