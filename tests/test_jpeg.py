# -*- coding: utf-8 -*-
"""Library-free baseline JPEG codec (operators/jpegkit.py): marker
walk, Huffman entropy coding, quantization, IDCT, subsampling,
restarts, refusals — plus the constant-block bit-exactness contract
the jpeg_pipeline driver query rests on."""

import numpy as np
import pytest

from rdf_converter_spark.operators.jpegkit import (
    decode_jpeg, encode_jpeg, parse_jpeg_header, quality_tables,
)


def _dc8_tables():
    ql, qc = (t.copy() for t in quality_tables(90))
    ql[0] = 8
    qc[0] = 8
    return ql, qc


def _const_block_image(wb, hb, seed=0):
    rng = np.random.RandomState(42 + seed)
    hexs = np.frombuffer(b"0123456789abcdef", np.uint8)
    blocks = hexs[rng.randint(0, 16, wb * hb)].reshape(hb, wb)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    return np.repeat(img[:, :, None], 3, 2)


def test_constant_blocks_bit_exact_420():
    # DC-only blocks + DC quantizer 8 -> lossless through the full
    # lossy pipeline (the jpeg_pipeline oracle contract)
    rgb = _const_block_image(5, 3)
    data = encode_jpeg(rgb, subsampling="420", quant_tables=_dc8_tables())
    assert np.array_equal(decode_jpeg(data), rgb)


def test_constant_blocks_bit_exact_gray_and_444():
    rgb = _const_block_image(3, 2, seed=1)
    for sub in ("gray", "444"):
        data = encode_jpeg(rgb, subsampling=sub,
                           quant_tables=_dc8_tables())
        assert np.array_equal(decode_jpeg(data), rgb), sub


def test_odd_dims_pad_and_crop():
    # non-MCU-multiple dims: encoder pads with edge replication,
    # decoder crops back to the SOF dims
    rgb = _const_block_image(3, 3, seed=2)[:17, :21]
    data = encode_jpeg(rgb, subsampling="420", quant_tables=_dc8_tables())
    out = decode_jpeg(data)
    assert out.shape == (17, 21, 3)


def test_header_parse():
    rgb = _const_block_image(4, 2)
    hdr = parse_jpeg_header(encode_jpeg(rgb, subsampling="420"))
    assert (hdr["format"], hdr["width"], hdr["height"],
            hdr["channels"]) == ("jpeg", 32, 16, 3)
    assert parse_jpeg_header(b"\x89PNG") is None
    g = parse_jpeg_header(encode_jpeg(rgb, subsampling="gray"))
    assert g["channels"] == 1


def test_lossy_roundtrip_noise_bounded():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (41, 67, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="444"))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 40 and err.mean() <= 8  # worst-case input


def test_lossy_roundtrip_smooth_tight():
    yy, xx = np.mgrid[0:48, 0:80]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (xx + yy) % 256], 2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85, subsampling="420"))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() <= 3


def test_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    b = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420",
                                restart_interval=2))
    assert np.array_equal(a, b)


def test_refusals():
    rgb = _const_block_image(2, 2)
    data = bytearray(encode_jpeg(rgb, quality=90))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC9  # arithmetic-coded sequential
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(data))
    data[i + 1] = 0xC2  # progressive SOF on a BASELINE scan header:
    #                     Se=63 in a DC scan is malformed, not pixels
    with pytest.raises(NotImplementedError, match="Se"):
        decode_jpeg(bytes(data))
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(encode_jpeg(rgb))[: 60])  # truncated
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatch():
    from rdf_converter_spark.operators.multimodal import (
        decode_image, decode_media_header,
    )

    rgb = _const_block_image(3, 2)
    data = encode_jpeg(rgb, subsampling="420", quant_tables=_dc8_tables())
    assert np.array_equal(decode_image(data), rgb)
    meta = decode_media_header(data)
    assert meta["format"] == "jpeg"
    assert (meta["width"], meta["height"]) == (24, 16)


def test_constant_blocks_bit_exact_422():
    rgb = _const_block_image(4, 2, seed=3)
    data = encode_jpeg(rgb, subsampling="422", quant_tables=_dc8_tables())
    assert np.array_equal(decode_jpeg(data), rgb)


def test_lossy_422_bounded():
    # horizontally-paired pixels: exactly the structure 4:2:2 chroma
    # preserves, so the residual error is quantization-only (random
    # UNPAIRED noise legitimately loses up to half the chroma range
    # to the 2x1 box mean — that is the format, not a codec bug)
    rng = np.random.RandomState(11)
    half = rng.randint(0, 256, (24, 20, 3)).astype(np.uint8)
    img = np.repeat(half, 2, axis=1)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="422"))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 40 and err.mean() <= 8


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker; the
    header walk and the full decode must skip them (ADVICE r4 — they
    were read as marker ids with bogus lengths)."""
    rgb = _const_block_image(3, 2, seed=5)
    data = encode_jpeg(rgb, subsampling="420", quant_tables=_dc8_tables())
    # pad the first DQT marker (right after SOI) with two fill bytes
    assert data[2:4] == b"\xff\xdb" or b"\xff\xdb" in data
    i = data.index(b"\xff\xdb")
    padded = data[:i] + b"\xff\xff" + data[i:]
    hdr = parse_jpeg_header(padded)
    assert hdr is not None and (hdr["width"], hdr["height"]) == (
        rgb.shape[1], rgb.shape[0])
    assert np.array_equal(decode_jpeg(padded), rgb)


# --- progressive mode (T.81 Annex G) ---------------------------------

def test_progressive_constant_blocks_bit_exact():
    from rdf_converter_spark.operators.jpegkit import (
        encode_jpeg_progressive,
    )

    rgb = _const_block_image(3, 2, seed=9)
    data = encode_jpeg_progressive(rgb, subsampling="444",
                                   quant_tables=_dc8_tables())
    hdr = parse_jpeg_header(data)
    assert hdr["_sof"] == 0xC2
    assert np.array_equal(decode_jpeg(data), rgb)


def test_progressive_equals_baseline_noise():
    """A progressive stream transmits EXACTLY the same quantized
    coefficients as the baseline stream (the successive-approximation
    scans refine to Al=0), so the two decodes must agree bit-for-bit
    on any input — far stronger than a lossy bound."""
    from rdf_converter_spark.operators.jpegkit import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    for sub in ("444", "420"):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsampling=sub))
        assert np.array_equal(base, prog), sub


def test_progressive_gray_and_odd_dims():
    from rdf_converter_spark.operators.jpegkit import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(12)
    g = rng.randint(0, 256, (19, 21)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(g, quality=90, subsampling="gray"))
    prog = decode_jpeg(
        encode_jpeg_progressive(g, quality=90, subsampling="gray"))
    assert np.array_equal(base, prog)
    # odd dimensions with 420 (padded MCU grid vs coded block grid)
    img = rng.randint(0, 256, (25, 35, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=75, subsampling="420"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=75, subsampling="420"))
    assert np.array_equal(base, prog)


def test_progressive_smooth_image_eob_runs():
    """A smooth gradient quantizes to long zero tails — the spectral
    band scans are dominated by EOB runs spanning many blocks."""
    from rdf_converter_spark.operators.jpegkit import (
        encode_jpeg_progressive,
    )

    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([
        (x * 2) % 256, (y * 3) % 256, ((x + y)) % 256
    ], axis=2).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=60, subsampling="444"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=60, subsampling="444"))
    assert np.array_equal(base, prog)


def test_decode_image_dispatch_progressive():
    from rdf_converter_spark.operators.jpegkit import (
        encode_jpeg_progressive,
    )
    from rdf_converter_spark.operators.multimodal import decode_image

    rgb = _const_block_image(2, 3, seed=21)
    data = encode_jpeg_progressive(rgb, subsampling="420",
                                   quant_tables=_dc8_tables())
    assert np.array_equal(decode_image(data), rgb)


def test_mutation_fuzz_terminates():
    """Crawl payloads are hostile: single-byte mutations of valid
    baseline AND progressive streams must always TERMINATE — either
    decode (bit flips in pixel data are still pixels) or raise —
    never hang or loop. Deterministic mutation schedule."""
    from rdf_converter_spark.operators.jpegkit import (
        encode_jpeg_progressive,
    )

    rgb = _const_block_image(3, 2, seed=13)
    streams = [
        encode_jpeg(rgb, quality=80, subsampling="420"),
        encode_jpeg_progressive(rgb, quality=80, subsampling="420"),
    ]
    rng = np.random.RandomState(99)
    outcomes = {"ok": 0, "raised": 0}
    for data in streams:
        buf = bytearray(data)
        for _ in range(40):
            i = int(rng.randint(2, len(buf)))
            old = buf[i]
            buf[i] = int(rng.randint(0, 256))
            try:
                out = decode_jpeg(bytes(buf))
                assert out.ndim == 3 and out.shape[2] == 3
                outcomes["ok"] += 1
            except Exception:  # noqa: BLE001 — any raise is fine
                outcomes["raised"] += 1
            buf[i] = old
    assert sum(outcomes.values()) == 80
