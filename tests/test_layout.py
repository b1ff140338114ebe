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


def test_parse_pdf_bytes_is_stubbed():
    with pytest.raises(NotImplementedError):
        layout.parse_pdf_bytes(b"%PDF-1.4 ...")


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
