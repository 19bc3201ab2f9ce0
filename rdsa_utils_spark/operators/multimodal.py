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
from pyspark.sql import Column, DataFrame
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


# --------------------------------------------------------------------------
# Payload-level dedup: digest-exact + perceptual-hash near-dup
# --------------------------------------------------------------------------


def payload_digest(
    df: DataFrame,
    binary_col: str = "payload",
    out_col: str = "digest",
) -> DataFrame:
    """Content digest (md5 hex) of a binary payload — the exact-dedup
    key. Pure JVM expression; identical to DuckDB ``md5`` over the
    same bytes, so the whole exact-dedup path is oracle-replayable."""
    return df.withColumn(out_col, F.md5(F.col(binary_col)))


def payload_exact_dedup(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Remove byte-identical payloads, keeping the min/max ``id_col``
    row per content digest — the first pass of any multimodal dedup
    pipeline (cheap, exact, catches re-uploads and mirrored files).

    Same shape as :func:`rdsa_utils_spark.operators.dedup.exact_dedup`
    (digest groupBy + per-group row_number, one hash-partitioned
    shuffle on the 32-hex digest — never on the payload bytes, which
    stay where they were read)."""
    if keep not in {"min", "max"}:
        raise ValueError("payload_exact_dedup: keep must be 'min' or 'max'")
    from pyspark.sql import Window

    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    w = Window.partitionBy("__digest__").orderBy(order)
    return (
        payload_digest(df, binary_col, "__digest__")
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__digest__", "__rn__")
    )


def payload_chunk_tokens(
    df: DataFrame,
    binary_col: str = "payload",
    chunk_bytes: int = 16,
    max_chunks: int = 256,
    out_col: str = "chunk_tokens",
) -> DataFrame:
    """Space-joined md5 digests of fixed-size byte chunks — the
    feature stream a PERCEPTUAL hash is computed over. This is the
    honest no-codec stand-in (byte blocks instead of decoded image
    tiles / audio frames); a real deployment swaps the chunker for a
    codec-aware feature extractor and everything downstream
    (signature, banding, verify) is unchanged.

    Pure JVM (``transform`` over a ``sequence`` of chunk offsets +
    binary ``substr`` + ``md5``) — no Python worker; the payload is
    scanned once per row. Payload size cost is capped at
    ``max_chunks·chunk_bytes`` bytes hashed per row.
    """
    if chunk_bytes <= 0 or max_chunks <= 0:
        raise ValueError("chunk_bytes and max_chunks must be > 0")
    p = F.col(binary_col)
    n_chunks = F.least(
        F.ceil(F.length(p) / F.lit(chunk_bytes)).cast("int"), F.lit(max_chunks),
    )
    # sequence(0, -1) DESCENDS in Spark — guard the empty payload.
    toks = F.when(F.length(p) > 0, F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.md5(p.substr(i * F.lit(chunk_bytes) + 1, F.lit(chunk_bytes))),
        ),
        " ",
    )).otherwise(F.lit(""))
    return df.withColumn(out_col, toks)


def payload_simhash(
    df: DataFrame,
    binary_col: str = "payload",
    chunk_bytes: int = 16,
    max_chunks: int = 256,
    out_col: str = "psimhash",
) -> DataFrame:
    """64-bit perceptual-hash stub for binary payloads: SimHash over
    the payload's chunk-digest token stream — byte-local edits flip
    only the bits voted by the touched chunks, so near-identical
    payloads land within a small Hamming distance (the property the
    banded join in :func:`payload_near_dups` exploits).

    Reuses :func:`rdsa_utils_spark.operators.dedup.simhash_signatures`
    verbatim on the JVM-derived token string (vectorized Arrow UDF for
    the bit voting only; chunking/digesting never leaves the JVM).
    Empty payloads get signature 0."""
    from rdsa_utils_spark.operators.dedup import simhash_signatures

    toked = payload_chunk_tokens(df, binary_col, chunk_bytes, max_chunks, "__ptoks__")
    return simhash_signatures(toked, "__ptoks__", out_col).drop("__ptoks__")


def payload_near_dups(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunk_bytes: int = 16,
    max_chunks: int = 256,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate payload pairs by perceptual-hash Hamming
    distance: 64-bit payload SimHash, split into ``n_bands`` equal bit
    bands, candidates generated by an EQUI-JOIN on (band index, band
    value) — the Hamming-space pigeonhole: any pair within
    ``max_hamming < n_bands`` bit flips shares at least one intact
    band, so recall is exactly 1.0 while the join stays bucketed (no
    all-pairs product). Candidates verify with
    ``bit_count(sig_a XOR sig_b) <= max_hamming``.

    Empty payloads are excluded (no content to be near-duplicate of —
    and a shared all-zero signature would otherwise cross-join every
    empty row). Run :func:`payload_exact_dedup` FIRST in a pipeline:
    byte-identical payloads share their full signature, so an
    undeduped corpus turns each duplicate cluster into a quadratic
    pair set.

    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``, one row
    per pair. 100 TB posture: only (id, 64-bit sig) rows shuffle —
    never payload bytes; band buckets bound the join fan-out the same
    way the MinHash LSH bands do (operators/dedup.py:178).
    """
    if not 0 <= max_hamming < n_bands:
        raise ValueError(
            "payload_near_dups: need 0 <= max_hamming < n_bands for the "
            "pigeonhole recall guarantee "
            f"(got max_hamming={max_hamming}, n_bands={n_bands})",
        )
    if 64 % n_bands != 0:
        raise ValueError("payload_near_dups: n_bands must divide 64")
    band_bits = 64 // n_bands
    sigs = payload_simhash(
        df.filter(F.length(F.col(binary_col)) > 0),
        binary_col, chunk_bytes, max_chunks, "__sig__",
    ).select(F.col(id_col).alias("__id__"), "__sig__")
    # Both sides of the banded self-join derive from sigs — pin the
    # narrow (id, 64-bit sig) frame so the chunk-digest + SimHash
    # pipeline over the payload bytes runs ONCE, not once per side.
    sigs = sigs.localCheckpoint(eager=False)

    def _band_val(b: int) -> Column:
        if band_bits == 64:  # n_bands=1: the band IS the signature
            return F.col("__sig__")
        mask = (1 << band_bits) - 1
        return (
            F.shiftright(F.col("__sig__"), b * band_bits).bitwiseAND(F.lit(mask))
        )

    banded = sigs.select(
        "__id__",
        "__sig__",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), _band_val(b).alias("val"))
                for b in range(n_bands)
            ]),
        ).alias("__band__"),
    ).select("__id__", "__sig__", "__band__.band", "__band__.val")
    a = banded.select(
        F.col("__id__").alias("id_a"), F.col("__sig__").alias("__sa__"),
        "band", "val",
    )
    b = banded.select(
        F.col("__id__").alias("id_b"), F.col("__sig__").alias("__sb__"),
        "band", "val",
    )
    pairs = (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa__", "__sb__")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("__sa__").bitwiseXOR(F.col("__sb__"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
