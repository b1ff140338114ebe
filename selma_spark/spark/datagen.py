"""Deterministic interleaved text+media span documents.

The pipeline's input table shape (BASELINE.json input_hint):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Two generators, both derived from the driver-provided testdata
``documents`` parquet (never from randomness, so every run — Spark or
DuckDB — reproduces the same bytes):

* :func:`interleaved_spans` — a *SQL-expressible* construction (plain
  column expressions, no UDF) whose sanitized output is also
  SQL-expressible; this is what the DuckDB correctness oracle mirrors.
* :func:`bench_spans` — a richer corpus cycling the reference's golden
  HTML fixtures (test/test_helper.rb:38-70) with nested span wrappers
  (test_helper.rb:24-26) and an optional 1%% skew tail of documents
  ~50x base size, exercising the salting/repartition path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
DOC_SCHEMA = f"doc_id string, spans {SPAN_SCHEMA}"

# Wrapper shapes keyed by doc_id % 6. Kept deliberately SQL-simple so the
# DuckDB oracle can reproduce both the construction and the DEFAULT- and
# RELAXED-sanitized outputs (see queries.py).
_WRAPPERS_SQL_SPARK = """
CASE CAST(doc_id AS BIGINT) % 6
  WHEN 0 THEN concat('<div>', text, '</div>')
  WHEN 1 THEN concat('<b>', text, '</b>')
  WHEN 2 THEN concat('<p class="x">', text, '</p>')
  WHEN 3 THEN concat(text, '<script>alert(1)</script>')
  WHEN 4 THEN concat('<a href="http://example.com/">', text, '</a>')
  ELSE concat('<span><strong>', text, '</strong></span>')
END
"""


def _span(kind: Column, text: Column, media_ref: Column, offset: Column) -> Column:
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


# interleaved_spans projection cache (r6): same rationale as
# _BENCH_SPAN_COLS — the expression tree is parameterless (unresolved
# attrs + literals), rebuilt identically per call (~0.13 s of py4j
# round-trips) by every span-corpus query in the catalog.
_INTERLEAVED_COLS: tuple | None = None


def interleaved_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> interleaved span documents.

    Layout per doc (deterministic in doc_id):
      span 0: text span, HTML wrapper chosen by doc_id %% 6
      span 1: media span 'media://{doc_id}/1'      iff doc_id %% 4 == 0
      span N: text span '<em>ok</em>'              iff doc_id %% 3 == 0
    """
    global _INTERLEAVED_COLS
    d = documents.select(
        F.col("doc_id").cast("bigint").alias("_id"),
        F.col("text"),
    )
    if _INTERLEAVED_COLS is not None:
        return d.select(*_INTERLEAVED_COLS)
    null_s = F.lit(None).cast("string")
    wrapped = F.expr(_WRAPPERS_SQL_SPARK)
    has_media = (F.col("_id") % 4) == 0
    has_extra = (F.col("_id") % 3) == 0

    span0 = _span(F.lit("text"), wrapped, null_s, F.lit(0))
    media = _span(
        F.lit("media"),
        null_s,
        F.concat(F.lit("media://"), F.col("_id").cast("string"), F.lit("/1")),
        F.lit(1),
    )
    extra_off = F.when(has_media, F.lit(2)).otherwise(F.lit(1))
    extra = _span(F.lit("text"), F.lit("<em>ok</em>"), null_s, extra_off)

    spans = F.concat(
        F.array(span0),
        F.when(has_media, F.array(media)).otherwise(F.array().cast(SPAN_SCHEMA)),
        F.when(has_extra, F.array(extra)).otherwise(F.array().cast(SPAN_SCHEMA)),
    )
    _INTERLEAVED_COLS = (
        F.col("_id").cast("string").alias("doc_id"), spans.alias("spans")
    )
    return d.select(*_INTERLEAVED_COLS)


def golden_payloads() -> list[str]:
    """The reference's golden HTML inputs, cycled into bench documents."""
    from ..golden import PROTOCOLS, STRINGS  # noqa: PLC0415
    payloads = [STRINGS[k]["html"] for k in sorted(STRINGS)]
    payloads += [PROTOCOLS[k]["html"] for k in sorted(PROTOCOLS)]
    # the null-byte vector breaks parquet round-trips in some readers;
    # keep corpus printable for the bench path
    return [p.replace("\0", "") for p in payloads]


# bench_spans projection-column cache (r6): the spans expression tree is
# ~0.25 s of driver-side py4j/expression building per call and depends
# only on (skew_pct, skew_factor), never on the input frame — the
# columns are unresolved attributes + literals (immutable JVM expression
# objects, valid for reuse across plans and sessions in one process).
# The frozen bench rebuilds the corpus per flagship rep, so without this
# every rep re-pays identical plan construction.
_BENCH_SPAN_COLS: dict = {}


def _bench_span_cols(skew_pct: float, skew_factor: int):
    key = (skew_pct, skew_factor)
    cols = _BENCH_SPAN_COLS.get(key)
    if cols is not None:
        return cols
    payloads = golden_payloads()
    payload_arr = F.array(*[F.lit(p) for p in payloads])
    depth = (F.col("_id") % 9).cast("int")
    nest_open = F.expr("repeat('<span>', CAST(_id % 9 AS INT))")
    nest_close = F.expr("repeat('</span>', CAST(_id % 9 AS INT))")
    payload = F.element_at(payload_arr, (F.col("_id") % len(payloads) + 1).cast("int"))
    base_html = F.concat(
        nest_open,
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        payload,
        nest_close,
    )
    skew_mod = max(2, int(round(1 / skew_pct)))
    is_skewed = (F.col("_id") % skew_mod) == 0
    html = F.when(
        is_skewed, F.concat_ws("<br>", F.array_repeat(base_html, skew_factor))
    ).otherwise(base_html)

    null_s = F.lit(None).cast("string")
    span0 = _span(F.lit("text"), html, null_s, F.lit(0))
    media = _span(
        F.lit("media"), null_s,
        F.concat(F.lit("media://"), F.col("_id").cast("string"), F.lit("/1")),
        F.lit(1),
    )
    span2 = _span(F.lit("text"), F.concat(F.lit("<b>tail "), depth.cast("string"), F.lit("</b>")), null_s,
                  F.when((F.col("_id") % 2) == 0, F.lit(2)).otherwise(F.lit(1)))
    spans = F.concat(
        F.array(span0),
        F.when((F.col("_id") % 2) == 0, F.array(media))
         .otherwise(F.array().cast(SPAN_SCHEMA)),
        F.array(span2),
    )
    cols = (F.col("_id").cast("string").alias("doc_id"), spans.alias("spans"))
    _BENCH_SPAN_COLS[key] = cols
    return cols


def bench_spans(
    documents: DataFrame,
    skew_pct: float = 0.01,
    skew_factor: int = 50,
    replicate: int = 1,
    n_partitions: int | None = None,
) -> DataFrame:
    """Richer deterministic corpus for benchmarking: golden HTML cycled by
    doc_id, wrapped in <span> nests of depth doc_id%%9, interleaved with
    media spans; ~skew_pct of documents carry a text span repeated
    skew_factor times (the 'giant document' tail)."""
    d = documents.select(
        F.col("doc_id").cast("bigint").alias("_id"), F.col("text")
    )
    if replicate > 1:
        # deterministic corpus scale-up: doc_id' = doc_id*replicate + rep.
        # The testdata parquet is one small file (one input split); a real
        # 100TB corpus arrives pre-split, so simulate that with an explicit
        # fixed-width repartition below.
        reps = F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("_rep")
        d = d.select("*", reps).select(
            (F.col("_id") * replicate + F.col("_rep")).alias("_id"), "text"
        )
    if n_partitions:
        d = d.repartition(n_partitions)
    doc_id_col, spans_col = _bench_span_cols(skew_pct, skew_factor)
    return d.select(doc_id_col, spans_col)
