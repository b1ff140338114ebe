"""Dependency-free BMP codec (multimodal de-stub, r4): spec-conformance
round-trips and rejection paths, independent of Spark."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from selma_spark.spark.multimodal import decode_media_bytes, synth_bmp


def _make_bmp(width, height, pixels, top_down=False):
    """Hand-rolled writer independent of synth_bmp: pixels[y][x] =
    (r, g, b) top-down."""
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    px = bytearray()
    rows = pixels if top_down else list(reversed(pixels))
    for row in rows:
        for r, g, b in row:
            px += bytes((b, g, r))
        px += pad
    h_field = -height if top_down else height
    header = (
        b"BM" + struct.pack("<I", 54 + len(px)) + b"\x00" * 4
        + struct.pack("<I", 54)
        + struct.pack("<IiiHHII", 40, width, h_field, 1, 24, 0, len(px))
        + b"\x00" * 16
    )
    return header + bytes(px)


@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=120, deadline=None)
def test_bmp_roundtrip_any_dims_any_orientation(w, h, top_down, rnd):
    pixels = [
        [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
         for _ in range(w)]
        for _ in range(h)
    ]
    dw, dh, out = decode_media_bytes(_make_bmp(w, h, pixels, top_down))
    assert (dw, dh) == (w, h)
    assert out == pixels


def test_synth_bmp_is_spec_conformant_and_roundtrips():
    for ref in ("media://0/1", "media://8/1", "media://123456/1"):
        payload = synth_bmp(ref)
        w, h, px = decode_media_bytes(payload)
        # independent re-encode through the hand-rolled writer matches
        assert decode_media_bytes(_make_bmp(w, h, px)) == (w, h, px)
        # row stride padding present when width*3 % 4 != 0
        assert len(payload) == 54 + ((w * 3 + 3) & ~3) * h


def test_non_bmp_payloads_raise_not_implemented():
    import pytest

    for bad in (b"", b"JUNKJUNK" * 10, b"\x89PNG\r\n\x1a\n" + b"\x00" * 60):
        with pytest.raises(NotImplementedError):
            decode_media_bytes(bad)
    # 8-bpp and RLE BMPs are rejected, not mis-decoded
    bad_bpp = bytearray(_make_bmp(2, 2, [[(0, 0, 0)] * 2] * 2))
    bad_bpp[28:30] = struct.pack("<H", 8)
    with pytest.raises(NotImplementedError):
        decode_media_bytes(bytes(bad_bpp))
    rle = bytearray(_make_bmp(2, 2, [[(0, 0, 0)] * 2] * 2))
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(NotImplementedError):
        decode_media_bytes(bytes(rle))


def test_truncated_pixel_array_raises_value_error():
    import pytest

    full = _make_bmp(4, 4, [[(1, 2, 3)] * 4] * 4)
    with pytest.raises(ValueError):
        decode_media_bytes(full[:-5])


def test_kmeans_refine_rejects_zero_rounds():
    import pytest

    from selma_spark.spark.simsearch import kmeans_refine

    with pytest.raises(ValueError):
        kmeans_refine(None, rounds=0)


def test_decoded_resize_never_upscales_small_images():
    """Aspect-fit semantics: images already inside the box keep their
    native dims (no upscale), larger ones shrink with ratio preserved
    within integer truncation."""
    import hashlib

    from selma_spark.spark.multimodal import _HEX, decode_media_bytes, synth_bmp

    for i in range(64):
        ref = f"media://{i * 4}/1"
        w, h, _ = decode_media_bytes(synth_bmp(ref))
        hx = hashlib.md5(ref.encode()).hexdigest()
        assert (w, h) == (4 + _HEX.index(hx[0]), 4 + _HEX.index(hx[1]))
        m = max(w, h)
        if m <= 8:
            nw, nh = w, h
        else:
            nw, nh = w * 8 // m, h * 8 // m
        assert 1 <= nw <= 8 and 1 <= nh <= 8 or m <= 8
        # ratio preserved within integer truncation
        if m > 8:
            assert abs(nw * h - nh * w) <= max(w, h)
