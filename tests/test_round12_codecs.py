"""Round-12: REAL pure-stdlib image codecs (BMP / PPM / PGM / PNG)
behind the multimodal decode contract (operators/multimodal.py).

The container has no imaging library, so the decoders are validated
against (a) the matching built-in encoders, (b) hand-built payloads
exercising every PNG filter type and BMP row-padding edge, and (c)
the arithmetic oracle identity the registry query ``multimodal_decode``
relies on (solid-color mean == the color, exactly).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rdsa_utils_spark.operators.multimodal import (
    _PNG_SIG,
    decode_image,
    decode_image_stats,
    encode_bmp,
    encode_png,
    encode_ppm,
    extract_image_metadata,
    synthesize_image_payloads,
)


@pytest.mark.parametrize("encoder,fmt", [
    (encode_bmp, "bmp"), (encode_ppm, "ppm"), (encode_png, "png"),
])
@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (5, 3), (30, 4), (31, 17)])
def test_roundtrip_solid_color(encoder, fmt, w, h):
    d = decode_image(encoder(w, h, (10, 200, 77)))
    assert (d["format"], d["width"], d["height"], d["n_channels"]) == (fmt, w, h, 3)
    # exact equality: a solid image's channel mean IS the color
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (10.0, 200.0, 77.0)


def test_bmp_row_padding_and_bgr_order():
    """Non-multiple-of-4 row widths force padding bytes; a decoder
    that reads them as pixels (or forgets BGR order) fails here."""
    # 3 px wide x 2 rows, distinct per-pixel colors, 24bpp
    px = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
          [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    rows = b""
    for row in reversed(px):  # bottom-up storage
        r = b"".join(bytes((b, g, rr)) for rr, g, b in row)
        rows += r + b"\x00" * ((4 - len(r) % 4) % 4)
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    d = decode_image(hdr + dib + rows)
    flat = np.array(px, dtype=np.float64).reshape(-1, 3)
    assert d["width"] == 3 and d["height"] == 2
    assert d["mean_r"] == pytest.approx(flat[:, 0].mean())
    assert d["mean_g"] == pytest.approx(flat[:, 1].mean())
    assert d["mean_b"] == pytest.approx(flat[:, 2].mean())


def test_bmp_32bpp_and_topdown():
    """BGRA 32-bit with negative (top-down) height decodes with
    n_channels=4 and alpha excluded from means."""
    w, h = 3, 2
    pix = b"".join(bytes((b, g, r, 255)) for r, g, b in
                   [(9, 8, 7)] * (w * h))
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(pix), 0, 0, 0, 0)
    d = decode_image(hdr + dib + pix)
    assert (d["width"], d["height"], d["n_channels"]) == (w, h, 4)
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (9.0, 8.0, 7.0)


def test_pgm_gray_with_comments():
    payload = b"P5\n# a comment\n4 2\n255\n" + bytes([9] * 8)
    d = decode_image(payload)
    assert (d["format"], d["width"], d["height"], d["n_channels"]) == ("pgm", 4, 2, 1)
    assert d["mean_r"] == d["mean_g"] == d["mean_b"] == 9.0


def _png_forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply PNG scanline filters FORWARD (encoder side) so the
    decoder's reconstruction of every filter type is exercised."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = flat[y]
        line = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                base = 0
            elif ft == 1:
                base = a
            elif ft == 2:
                base = b
            elif ft == 3:
                base = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                base = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[i] = (int(cur[i]) - base) & 0xFF
        out.append(ft)
        out.extend(line.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_all_filters_and_color_types(ctype, ch):
    rng = np.random.default_rng(42)
    w, h = 7, 9
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    raw = _png_forward_filter(img, [0, 1, 2, 3, 4])

    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = decode_image(payload)
    assert (d["width"], d["height"], d["n_channels"]) == (w, h, ch)
    flat = img.reshape(-1, ch).astype(np.float64)
    if ch >= 3:
        exp = (flat[:, 0].mean(), flat[:, 1].mean(), flat[:, 2].mean())
    else:
        exp = (flat[:, 0].mean(),) * 3
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == pytest.approx(exp)


@pytest.mark.parametrize("payload,msg", [
    (b"JFIFxxxxxx", "unsupported image format"),
    (b"", "empty or truncated"),
    (b"BM" + b"\x00" * 10, "truncated BMP"),
    (b"P6\n2 2\n70000\n" + b"\x00" * 24, "maxval"),
    (_PNG_SIG + b"\x00" * 8, "PNG missing IHDR"),
])
def test_decode_error_paths(payload, msg):
    with pytest.raises(ValueError, match=msg):
        decode_image(payload)


def test_png_interlaced_refused():
    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_image(payload)


def test_extract_image_metadata_codec_stub(spark):
    rows = [(0, encode_bmp(4, 3, (1, 2, 3))), (1, encode_png(5, 2, (9, 9, 9)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           extract_image_metadata(df, decode_stub="codec").collect()}
    assert (out[0]["format"], out[0]["width"], out[0]["height"]) == ("bmp", 4, 3)
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("png", 5, 2)
    assert set(out[0].asDict()) == {
        "doc_id", "n_bytes", "format", "width", "height", "n_channels",
    }


def test_extract_image_metadata_raise_stub_still_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    df = spark.createDataFrame([(0, b"BMxx")], "doc_id long, payload binary")
    with pytest.raises((PythonException, Py4JJavaError), match="NotImplementedError"):
        extract_image_metadata(df, decode_stub="raise").collect()


def test_codec_stub_unknown_payload_surfaces_value_error(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    df = spark.createDataFrame([(0, b"JFIF0000")], "doc_id long, payload binary")
    with pytest.raises((PythonException, Py4JJavaError), match="unsupported image format"):
        extract_image_metadata(df, decode_stub="codec").collect()


def test_synthesize_then_decode_matches_arithmetic_oracle(spark, sf_dir):
    """The exact identity the registry query ``multimodal_decode``
    stakes its hash-checked oracle on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = decode_image_stats(synthesize_image_payloads(docs))
    src = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    for r in out.collect():
        i, s = r["doc_id"], src[r["doc_id"]]
        assert r["format"] == ("bmp", "ppm", "png")[i % 3]
        assert r["width"] == 1 + s % 31
        assert r["height"] == 1 + (s // 31) % 17
        assert r["n_channels"] == 3
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            float(i % 256), float(i * 7 % 256), float(i * 13 % 256),
        )
