"""PDF / layout parsing leg of the extraction tier.

The north rule's main-content extraction covers three input shapes:
HTML boilerplate strip (rewriter + extract.ContentExtractor), DOM
heuristics (selector-driven handlers), and PDF/layout parse — this
module. No PDF rasterizer/parser library ships in this container, so
the byte-level parser is STUBBED (``parse_pdf_bytes`` raises
NotImplementedError, exactly like multimodal.decode_media_bytes), while
everything Spark-side is real and tested: the page/block schema, the
arrow-batched mapInPandas stage, and the reading-order reassembly into
the pipeline's interleaved span schema (kind, text, media_ref, offset).

A deterministic fake layout (pure arithmetic in doc_id) stands in for
the parser so the reading-order logic has value-level oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# block = one laid-out box on a page. bbox in (page, y, x) reading order.
BLOCK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("block_no", IntegerType()),
        StructField("page_no", IntegerType()),
        StructField("y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
    ]
)


def parse_pdf_bytes(payload: bytes) -> list[dict]:
    """Real PDF/layout parse of one document's bytes -> blocks.

    STUB: requires a layout parser (pdfminer/poppler/unstructured),
    none of which ship in this container. The Spark-side contract
    (BLOCK_SCHEMA, batching, reading order) is what this module tests."""
    raise NotImplementedError(
        "PDF parsing requires a layout library not present in this "
        "environment; use fake_layout_blocks for the plumbing tests"
    )


def fake_layout(doc_id: int) -> list[tuple]:
    """Deterministic stand-in parser: pure arithmetic in doc_id (no RNG,
    no I/O) so a SQL oracle can reproduce it value-for-value."""
    n_blocks = 3 + doc_id % 3
    out = []
    for j in range(n_blocks):
        page = j // 2
        y = (j * 37 + doc_id) % 100
        x = (j * 53 + doc_id) % 50
        if (doc_id + j) % 5 == 0:
            out.append(
                (doc_id, j, page, y, x, "media", None,
                 f"media://{doc_id}/p{page}b{j}")
            )
        else:
            out.append(
                (doc_id, j, page, y, x, "text", f"block {j} of {doc_id}",
                 None)
            )
    return out


def layout_blocks(docs: DataFrame) -> DataFrame:
    """mapInPandas layout-parse stage: one arrow batch of documents in,
    exploded blocks out (the real parser would read a binary `payload`
    column; the stub derives blocks from doc_id)."""
    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def fn(batches):
        import pandas as pd  # noqa: PLC0415 (executor-side import)

        from selma_spark.spark.layout import fake_layout  # noqa: PLC0415

        cols = [f.name for f in BLOCK_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                rows.extend(fake_layout(int(d)))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id").mapInPandas(fn, schema=BLOCK_SCHEMA)


def reading_order_spans(blocks: DataFrame) -> DataFrame:
    """Assemble parsed blocks into the pipeline's interleaved span
    documents: blocks sorted in reading order (page_no, y, x, block_no),
    offsets = reading-order index, media blocks pass through as media
    spans. JVM-side: groupBy + sort_array + transform (the two-argument
    transform lambda receives (element, index))."""
    packed = blocks.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("page_no", "y", "x", "block_no", "kind", "text",
                         "media_ref")
            )
        ).alias("ordered")
    )
    spans = F.transform(
        "ordered",
        lambda b, i: F.struct(
            b["kind"].alias("kind"),
            b["text"].alias("text"),
            b["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return packed.select("doc_id", spans.alias("spans"))
