"""Multimodal (binary) column operators for training-data pipelines.

No reference equivalent (extension surface). Media payloads are
opaque ``binary`` columns with typed metadata structs; the engine's
job is the Spark-side plumbing — schemas, Arrow batch shape,
partition sizing — while actual codecs plug in per deployment.

Decode/resize/frame-sample run through ``mapInPandas`` (Arrow batch
iterator): one Python worker per partition, zero-copy binary
buffers. The image/audio libraries are NOT in this container, so the
codec step has three modes:
- ``decode_stub="codec"``: REAL pure-stdlib decoders (round 12) for
  BMP (24/32-bit uncompressed), PPM/PGM (binary P6/P5) and PNG
  (8-bit gray/RGB/RGBA, non-interlaced, stdlib ``zlib``) — see
  :func:`decode_image` / :func:`decode_image_stats`. Anything
  heavier (JPEG, video, audio) still plugs in via ``decoder=``.
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
    ``decode_stub="codec"`` uses the built-in pure-stdlib decoders
    (BMP/PPM/PGM/PNG — :func:`decode_image`); payloads in any other
    format raise ``ValueError`` (plug a ``decoder=`` in for those).
    """
    if decoder is None:
        if decode_stub == "raise":
            def decoder(_: bytes) -> dict:
                raise NotImplementedError(
                    "No image codec in this environment. Pass decoder= with a "
                    "callable(bytes) -> {n_bytes, format, width, height, n_channels}, "
                    "or use decode_stub='codec' for BMP/PPM/PGM/PNG payloads.",
                )
        elif decode_stub == "deterministic":
            decoder = _fake_decode
        elif decode_stub == "codec":
            def decoder(payload: bytes) -> dict:
                full = decode_image(payload)
                return {
                    k: full[k]
                    for k in ("n_bytes", "format", "width", "height", "n_channels")
                }
        else:
            raise ValueError(
                "decode_stub must be 'deterministic', 'raise' or 'codec'",
            )

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


# --------------------------------------------------------------------------
# Real pure-stdlib image codecs (round 12): BMP / PPM / PGM / PNG
# --------------------------------------------------------------------------
#
# No third-party imaging library exists in this environment, so the
# "real codec" milestone is met with formats the Python stdlib can
# decode exactly: uncompressed BMP, binary PPM/PGM, and PNG via
# ``zlib``. The decoders return pixel-verified metadata AND
# per-channel means, so a decode query is replayable by an arithmetic
# oracle when the payloads are deterministically synthesized
# (solid-color images: mean == the color, exactly — IEEE division of
# n·c by n returns c). Heavier codecs (JPEG/video/audio) still enter
# through the pluggable ``decoder=`` contract.

IMAGE_DECODE_SCHEMA = (
    "n_bytes long, format string, width int, height int, n_channels int, "
    "mean_r double, mean_g double, mean_b double"
)


def _decode_bmp(payload: bytes) -> dict:
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off, = struct.unpack_from("<I", payload, 10)
    hdr_size, = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    compression, = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    n_rows = abs(height)  # height < 0 = top-down; sign is row order only
    n_ch = bpp // 8
    row_size = ((width * n_ch + 3) // 4) * 4
    need = data_off + row_size * n_rows
    if len(payload) < need:
        raise ValueError(f"truncated BMP pixel data ({len(payload)} < {need})")
    rows = np.frombuffer(
        payload, np.uint8, count=row_size * n_rows, offset=data_off,
    ).reshape(n_rows, row_size)[:, : width * n_ch].reshape(n_rows, width, n_ch)
    # pixel order is BGR(A); row order (bottom-up vs top-down) does not
    # affect channel means
    px = rows.reshape(-1, n_ch).astype(np.float64)
    mean_b, mean_g, mean_r = px[:, 0].mean(), px[:, 1].mean(), px[:, 2].mean()
    return {
        "n_bytes": len(payload), "format": "bmp",
        "width": int(width), "height": int(n_rows), "n_channels": n_ch,
        "mean_r": float(mean_r), "mean_g": float(mean_g), "mean_b": float(mean_b),
    }


def _ppm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII ints from a PPM/PGM
    header, honouring ``#`` comments; returns (values, next offset)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        if i >= len(payload):
            raise ValueError("truncated PPM/PGM header")
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tok = payload[i:j]
            if not tok.isdigit():
                raise ValueError(f"bad PPM/PGM header token {tok!r}")
            vals.append(int(tok))
            i = j
    return vals, i + 1  # consume the single whitespace after the last token


def _decode_ppm(payload: bytes) -> dict:
    import numpy as np

    magic = payload[:2]
    n_ch = 3 if magic == b"P6" else 1
    fmt = "ppm" if magic == b"P6" else "pgm"
    (width, height, maxval), off = _ppm_tokens(payload, 3, 2)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad {fmt.upper()} dimensions {width}x{height}")
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported {fmt.upper()} maxval {maxval} (8-bit only)")
    need = off + width * height * n_ch
    if len(payload) < need:
        raise ValueError(f"truncated {fmt.upper()} pixel data ({len(payload)} < {need})")
    px = np.frombuffer(
        payload, np.uint8, count=width * height * n_ch, offset=off,
    ).reshape(-1, n_ch).astype(np.float64)
    if n_ch == 3:
        mr, mg, mb = px[:, 0].mean(), px[:, 1].mean(), px[:, 2].mean()
    else:
        mr = mg = mb = px[:, 0].mean()
    return {
        "n_bytes": len(payload), "format": fmt,
        "width": width, "height": height, "n_channels": n_ch,
        "mean_r": float(mr), "mean_g": float(mg), "mean_b": float(mb),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int, n_ch: int):
    """Reverse PNG scanline filtering (types 0-4) for 8-bit samples.
    Row-vectorized where the filter allows (None/Up); Sub/Average/
    Paeth carry a left-neighbour dependency, walked per byte on a
    bytearray (payload rows, not corpus rows — bounded work)."""
    import numpy as np

    stride = width * n_ch
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG scanline data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += stride + 1
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - n_ch] if i >= n_ch else 0
                b = int(prev[i])
                if ftype == 1:
                    base = a
                elif ftype == 3:
                    base = (a + b) >> 1
                else:
                    c = int(prev[i - n_ch]) if i >= n_ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    base = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (line[i] + base) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, n_ch)


def _decode_png(payload: bytes) -> dict:
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    width = height = None
    n_ch = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + body + CRC (CRC not verified)
        if ctype == b"IHDR":
            width, height, depth, ctype_id, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body,
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            chans = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype_id)
            if chans is None:
                raise ValueError(f"unsupported PNG color type {ctype_id}")
            n_ch = chans
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    px = _png_unfilter(zlib.decompress(bytes(idat)), width, height, n_ch)
    flat = px.reshape(-1, n_ch).astype(np.float64)
    if n_ch >= 3:  # RGB / RGBA — alpha excluded from the means
        mr, mg, mb = flat[:, 0].mean(), flat[:, 1].mean(), flat[:, 2].mean()
    else:  # gray / gray+alpha
        mr = mg = mb = flat[:, 0].mean()
    return {
        "n_bytes": len(payload), "format": "png",
        "width": int(width), "height": int(height), "n_channels": n_ch,
        "mean_r": float(mr), "mean_g": float(mg), "mean_b": float(mb),
    }


def decode_image(payload: bytes) -> dict:
    """Decode a BMP / PPM / PGM / PNG payload (pure stdlib + numpy).

    Returns a dict matching :data:`IMAGE_DECODE_SCHEMA`: byte count,
    detected format, pixel-verified dimensions/channels, and exact
    per-channel means (gray images replicate the gray mean into all
    three). Raises ``ValueError`` for any other format — the honest
    boundary of the built-in surface; plug heavier codecs in through
    the ``decoder=`` parameter of the mapInPandas operators.
    """
    if payload is None or len(payload) < 2:
        raise ValueError("empty or truncated image payload")
    if payload[:2] == b"BM":
        return _decode_bmp(bytes(payload))
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(bytes(payload))
    if payload[:8] == _PNG_SIG:
        return _decode_png(bytes(payload))
    head = bytes(payload[:8])
    raise ValueError(
        f"unsupported image format (magic {head!r}): built-in codecs are "
        "BMP/PPM/PGM/PNG — pass decoder= for anything else",
    )


def encode_bmp(width: int, height: int, rgb: tuple) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (solid color) — the
    deterministic payload source for decode tests and oracles."""
    import struct

    r, g, b = rgb
    row = bytes((b, g, r)) * width
    row += b"\x00" * ((4 - len(row) % 4) % 4)
    pixels = row * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def encode_ppm(width: int, height: int, rgb: tuple) -> bytes:
    """Minimal binary PPM (P6) encoder (solid color)."""
    return (
        f"P6\n{width} {height}\n255\n".encode()
        + bytes(rgb) * (width * height)
    )


def encode_png(width: int, height: int, rgb: tuple) -> bytes:
    """Minimal 8-bit RGB PNG encoder (solid color, filter 0 rows,
    stdlib zlib) — exercises the IDAT inflate + unfilter path."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + bytes(rgb) * width) * height
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_image_stats(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] = decode_image,
) -> DataFrame:
    """Decode each payload with the REAL built-in codecs and emit
    pixel statistics: ``(id, n_bytes, format, width, height,
    n_channels, mean_r, mean_g, mean_b)``.

    Same mapInPandas shape as :func:`extract_image_metadata` — one
    Arrow batch iterator per partition, payload bytes never shuffle
    (the projection happens at the scan). A custom ``decoder`` must
    return the full :data:`IMAGE_DECODE_SCHEMA` key set.
    """
    out_schema = f"{id_col} long, {IMAGE_DECODE_SCHEMA}"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decoder(b) for b in pdf[binary_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, binary_col).mapInPandas(_batches, schema=out_schema)


def synthesize_image_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    out_col: str = "payload",
) -> DataFrame:
    """Deterministic solid-color image payloads for the real codec
    path: each row becomes a BMP / PPM / PNG (``id % 3``) whose
    dimensions and color derive arithmetically from ``(id, size)`` —
    ``width = 1 + size % 31``, ``height = 1 + (size // 31) % 17``,
    ``rgb = (id % 256, id·7 % 256, id·13 % 256)``. Because the decode
    of a solid-color image returns exactly these values,
    synthesize → :func:`decode_image_stats` is replayable by a pure
    arithmetic SQL oracle — the correctness gate for the codec layer
    without any imaging library in the container.

    Output: ``(id, payload binary)`` via one mapInPandas pass (the
    payload bytes are born on the executors and never shuffle).
    """
    out_schema = f"{id_col} long, {out_col} binary"
    encoders = (encode_bmp, encode_ppm, encode_png)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[size_col]):
                i, s = int(i), int(s)
                w, h = 1 + s % 31, 1 + (s // 31) % 17
                rgb = (i % 256, (i * 7) % 256, (i * 13) % 256)
                payloads.append(encoders[i % 3](w, h, rgb))
            yield pd.DataFrame({id_col: pdf[id_col].values, out_col: payloads})

    return df.select(id_col, size_col).mapInPandas(_batches, schema=out_schema)
