"""The distributed rewrite pipeline.

Spark-first design notes (scale target: 10^12 docs / ~100 TB):

* The document rewrite is a NARROW transformation: scan -> mapInArrow ->
  sink. Zero shuffles on the hot path; parallelism comes from input
  splits (``spark.sql.files.maxPartitionBytes``), so the plan scales
  linearly with executors — this is what the N->4N scaling-efficiency
  criterion measures.
* All per-token work happens inside ONE arrow-vectorized UDF per batch
  (the reference fuses all handlers into one streaming parse,
  reference rewriter.rs:356-440 / README.md:7; Catalyst cannot fuse
  across opaque UDFs, so we must not split handlers into separate UDF
  columns).
* Documents whose text spans contain no ``<`` bypass tokenization
  entirely (cheap Python check; semantics are identity for tag-free
  text — pinned by test/selma_sanitizer_parser_test.rb:7-13).
* Skew: documents are atomic units, so giant-document skew is handled
  by *byte-weighted bucketing* (greedy round-robin over size order) —
  an explicit repartition, used when writing resumable output.
* Resume: output is bucketed by a DETERMINISTIC function of doc_id
  (not spark_partition_id), written per-bucket with dynamic partition
  overwrite; a ``lineage`` table records completed buckets and a
  restart anti-joins them away.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rewriter import Rewriter
from ..sanitizer import BUILTIN_CONFIGS
from .datagen import DOC_SCHEMA

METRICS_SCHEMA = (
    "stage string, partition_id int, docs long, bytes_in long, "
    "bytes_out long, wall_ms long"
)
LINEAGE_SCHEMA = (
    "partition_id int, doc_count long, checksum string, status string, "
    "attempt int, ts timestamp"
)

# Task-local rewrite-outcome memo bounds (sanitize-only paths; see
# make_rewrite_fn). Web corpora repeat short boilerplate spans
# (nav/footer/template fragments) across millions of documents within one
# task, and a sanitize-only rewrite is a pure function of (text, frozen
# config) — the same argument as the rewriter's _sanitize_element memo,
# one level up. Bounds keep the worst case (adversarial all-distinct
# spans) at ~tens of MB per task: only spans <= _DOC_MEMO_MAX_LEN chars
# are memoized, and the dict is cleared (not evicted) at the cap so the
# overflow path stays one branch.
_DOC_MEMO_CAP = 8192
_DOC_MEMO_MAX_LEN = 2048


def resolve_config(config):
    """Accept a builtin name, a config dict, or None (sanitizer off)."""
    if isinstance(config, str):
        return BUILTIN_CONFIGS[config.lower()]
    return config


def make_rewrite_fn(config="default", handlers_factory=None,
                    max_text_bytes=None, on_error="raise", memo_bc=None):
    """Build the mapInArrow function: record batches of
    (..., spans, ...) rows in, same schema out. Text spans are rewritten;
    media spans pass through byte-identical with order preserved.

    Works directly on the arrow ListArray's flat struct children — only
    the text strings ever cross into Python objects (no per-span dict
    materialization), which keeps the arrow hop ~5x cheaper than a
    pandas round-trip on nested data."""
    cfg = resolve_config(config)

    def fn(batches):
        import pyarrow as pa  # noqa: PLC0415 (executor-side import)

        # one Rewriter per task (the reference rebuilds its handler table
        # per #rewrite — rewriter.rs:330 TODO notes the waste; we hoist it)
        handlers = handlers_factory() if handlers_factory else None
        if cfg is None and not handlers:
            rewriter = None  # pure passthrough
            rw = None
        else:
            rewriter = Rewriter(sanitizer=cfg, handlers=handlers or [])
            base_rw = rewriter.rewrite
            if on_error == "keep":
                # per-document containment: a pathological document must
                # not fail a 10^12-doc job; quarantined docs pass through
                # unmodified (detectable downstream: output == input)
                def rw(t, _rw=base_rw):
                    try:
                        return _rw(t)
                    except Exception:
                        return t
            else:
                rw = base_rw
            if max_text_bytes is not None:
                # oversized-span quarantine (the reference's memory caps,
                # rewriter.rs:156-227, re-expressed as a routing decision)
                def rw(t, _rw=rw, _cap=max_text_bytes):
                    return t if len(t) > _cap else _rw(t)
            if not handlers:
                # sanitize-only rewrite is a pure function of the span
                # text (handlers may carry state across calls, so they
                # are excluded): memoize short spans per task. Repeated
                # boilerplate spans — the dominant shape in real web
                # corpora — collapse to one dict hit after the first
                # occurrence (r6; bounds documented at _DOC_MEMO_CAP).
                doc_memo = {}

                def rw(t, _rw=rw, _memo=doc_memo):
                    v = _memo.get(t)
                    if v is None:
                        v = _rw(t)
                        if len(t) <= _DOC_MEMO_MAX_LEN:
                            if len(_memo) >= _DOC_MEMO_CAP:
                                _memo.clear()
                            _memo[t] = v
                    return v
        import pyarrow.compute as pc  # noqa: PLC0415

        if rw is None and memo_bc is None:
            # pure passthrough (config None, no handlers): the rebuild
            # below is an identity — skip the arrow decode/re-encode of
            # every text cell entirely (r6)
            yield from batches
            return

        if memo_bc is not None and rw is not None:
            memo_get = memo_bc.value.get
            bc_base_rw = rw

            def rw(t, _get=memo_get, _rw=bc_base_rw):
                v = _get(t)
                return _rw(t) if v is None else v

        for batch in batches:
            spans_idx = batch.schema.get_field_index("spans")
            lst = batch.column(spans_idx)
            # .offsets are absolute indices into .values even for sliced
            # arrays, so reconstruction below is slice-safe
            values = lst.values
            kinds = values.field("kind")
            texts = values.field("text")
            # candidate selection stays in C (r6): only text spans that
            # are non-null, non-empty and contain '<' ever cross into
            # Python objects; everything else is carried over inside the
            # original arrow buffers by replace_with_mask (the old path
            # round-tripped EVERY span text through to_pylist + re-encode
            # — ~11% of per-task wall on bench-shaped batches). NULL/''
            # semantics match the old `k and t and "<" in t` check:
            # match_substring('') is false, and fill_null folds the
            # null-kind / null-text cases to false.
            if rw is None:
                # passthrough config carrying a broadcast memo: the memo
                # was itself built by the identity rewrite, so texts pass
                # through unchanged (matches the old per-row condition)
                new_texts_arr = texts
            else:
                mask = pc.fill_null(
                    pc.and_(
                        pc.and_(pc.equal(kinds, "text"), texts.is_valid()),
                        pc.match_substring(texts, "<"),
                    ),
                    False,
                )
                rewritten = pa.array(
                    [rw(t) for t in texts.filter(mask).to_pylist()],
                    type=pa.string(),
                )
                new_texts_arr = pc.replace_with_mask(texts, mask, rewritten)
            struct_type = lst.type.value_type
            new_values = pa.StructArray.from_arrays(
                [
                    kinds,
                    new_texts_arr,
                    values.field("media_ref"),
                    values.field("offset"),
                ],
                # reuse the incoming field metadata so nullability survives
                # the round-trip (literal-built plans declare non-null)
                fields=[struct_type.field(i) for i in range(struct_type.num_fields)],
            )
            # null spans arrays must stay null (from_arrays would
            # otherwise rebuild them as empty lists)
            mask = None
            if lst.null_count:
                mask = pc.is_null(lst)
            new_lst = pa.ListArray.from_arrays(
                lst.offsets, new_values, type=lst.type, mask=mask
            )
            arrays = [
                new_lst if i == spans_idx else batch.column(i)
                for i in range(batch.num_columns)
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=batch.schema)

    return fn


def rewrite_documents(
    docs: DataFrame,
    config="default",
    handlers_factory=None,
    max_text_bytes=None,
    on_error="raise",
) -> DataFrame:
    """Rewrite every text span of every document. Narrow plan: no shuffle."""
    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    return docs.mapInArrow(
        make_rewrite_fn(config, handlers_factory, max_text_bytes, on_error),
        schema=docs.schema,
    )


def rewrite_documents_memo(
    docs: DataFrame,
    config="default",
    handlers_factory=None,
    max_text_bytes=None,
    on_error="raise",
    max_distinct: int = 2_000_000,
    max_memo_bytes: int = 256 << 20,
) -> DataFrame:
    """Dedup-before-rewrite, broadcast flavor: rewrite each DISTINCT text
    payload once in a small side job, broadcast the text->output dict,
    and keep the main pass NARROW (mapInArrow lookup; zero shuffle of
    the corpus). Same output as rewrite_documents.

    This is the right shape when the distinct-payload set is bounded
    (boilerplate-heavy web corpora: nav/footer/template spans repeat
    millions of times). The distinct set must fit in executor memory —
    enforced by ``max_distinct``; above it, falls back to
    rewrite_documents_dedup (join-based, unbounded cardinality)."""
    spark = docs.sparkSession
    # the distinct payload set must fit in driver memory; check BOTH the
    # row cap and the byte cap DISTRIBUTEDLY before any driver collect
    # (a few-but-huge-payload corpus would otherwise OOM the driver
    # inside toPandas before the byte check ever ran)
    distinct_df = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "text")
        .select(F.col("s.text").alias("text"))
        .where(F.col("text").isNotNull() & F.col("text").contains("<"))
        .distinct()
        .persist()
    )
    try:
        stats = distinct_df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("chars"),
        ).first()
        if stats["n"] > max_distinct or stats["chars"] > max_memo_bytes:
            return rewrite_documents_dedup(
                docs, config, handlers_factory, max_text_bytes, on_error
            )
        distinct_pdf = distinct_df.toPandas()
    finally:
        distinct_df.unpersist()
    # rewrite the distinct payloads in a small local-data job (no second
    # corpus scan), keyed by position
    wrapped = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(distinct_pdf["text"])],
        "doc_id string, text string",
    ).select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    out_by_key = (
        rewrite_documents(
            wrapped, config, handlers_factory, max_text_bytes, on_error
        )
        .select("doc_id", F.element_at("spans", 1)["text"].alias("out"))
        .toPandas()
        .set_index("doc_id")["out"]
    )
    memo_bc = spark.sparkContext.broadcast(
        {
            t: out_by_key[str(i)]
            for i, t in enumerate(distinct_pdf["text"])
        }
    )
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    return docs.mapInArrow(
        make_rewrite_fn(config, handlers_factory, max_text_bytes, on_error,
                        memo_bc=memo_bc),
        schema=docs.schema,
    )


def rewrite_documents_dedup(
    docs: DataFrame,
    config="default",
    handlers_factory=None,
    max_text_bytes=None,
    on_error="raise",
    broadcast_rewritten: bool = False,
) -> DataFrame:
    """Rewrite with distinct-payload elimination: rewrite each DISTINCT
    text span once, hash-join the results back, reassemble spans in
    offset order. Same output as rewrite_documents (span-sequence
    equality; pinned by tests/test_spark_pipeline.py).

    Trade-off vs the narrow path: +2 shuffles (distinct + join +
    reassembly groupBy) in exchange for running the Python rewrite once
    per distinct payload. On web corpora (20-40% exact-dup pages,
    boilerplate-heavy) the Python pass dominates end-to-end cost by
    10-50x per byte, so this wins whenever the dup ratio is
    non-trivial; on an all-unique corpus it only costs the shuffles.
    The join key is md5(text) (not the text itself) so shuffle rows
    stay narrow.

    ``broadcast_rewritten=True`` hints the rewritten-distinct side into a
    broadcast hash join so the corpus side never shuffles for the join.
    Like any broadcast (and like rewrite_documents_memo), the build side
    still transits the driver in BroadcastExchange — only use it when
    the distinct-payload set is known to fit comfortably in driver and
    executor memory."""
    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    span_t = docs.schema["spans"].dataType.elementType

    ex = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select("doc_id", "pos", F.col("s.*"))
    # NULL text must not share a key with '' (md5(coalesce) would collide
    # them and F.first could swap one for the other); prefix-disambiguate
    text_rows = ex.where(F.col("kind") == "text").withColumn(
        "_h",
        F.when(F.col("text").isNull(), F.lit("null:"))
        .otherwise(F.concat(F.lit("md5:"), F.md5("text"))),
    )

    distinct = text_rows.select("_h", "text").groupBy("_h").agg(
        F.first("text").alias("text")
    )
    # run the distinct payloads through the SAME arrow UDF (wrapped as
    # single-span docs so the fast paths/quarantine behavior match)
    wrapped = distinct.select(
        F.col("_h").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    rewritten = rewrite_documents(
        wrapped, config, handlers_factory, max_text_bytes, on_error
    ).select(
        F.col("doc_id").alias("_h"),
        F.element_at("spans", 1)["text"].alias("_out_text"),
    )

    if broadcast_rewritten:
        rewritten = F.broadcast(rewritten)
    new_text = (
        text_rows.join(rewritten, "_h")
        .select(
            "doc_id", "pos", "kind",
            F.col("_out_text").alias("text"),
            "media_ref", "offset",
        )
    )
    media_rows = ex.where(F.col("kind") != "text")
    all_rows = new_text.unionByName(media_rows)
    reassembled = (
        all_rows.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            F.struct("kind", "text", "media_ref", "offset").alias("s"),
                        )
                    )
                ),
                lambda e: e["s"],
            )
            .cast(f"array<{span_t.simpleString()}>")
            .alias("spans"),
        )
    )
    # docs with zero spans still round-trip (left join back to the keys);
    # NULL spans arrays stay NULL (parity with rewrite_documents, which
    # masks them through the arrow hop) — only genuinely-empty arrays
    # come back as empty
    arr_t = f"array<{span_t.simpleString()}>"
    keys = docs.select(
        "doc_id",
        F.col("spans").isNull().alias("_spans_null"),
        *[c for c in docs.columns if c not in ("doc_id", "spans")],
    )
    return keys.join(reassembled, "doc_id", "left").select(
        *[
            F.when(F.col("_spans_null"), F.lit(None).cast(arr_t))
            .otherwise(F.coalesce("spans", F.array().cast(arr_t)))
            .alias("spans")
            if c == "spans"
            else c
            for c in docs.columns
        ]
    )


# rewritten_text projection cache (r6): three HOF lambda conversions of
# py4j work per call, parameterless — same reuse argument as the datagen
# column caches (immutable expression objects).
_REWRITTEN_TEXT_COL = None


def rewritten_text(docs: DataFrame, config="default") -> DataFrame:
    """Rewrite + concatenate the text spans per document (offset order).
    Returns (doc_id, out_text) — the comparison surface the SQL oracle
    can mirror."""
    global _REWRITTEN_TEXT_COL
    out = rewrite_documents(docs, config)
    if _REWRITTEN_TEXT_COL is None:
        _REWRITTEN_TEXT_COL = F.array_join(
            F.transform(
                F.array_sort(
                    F.filter("spans", lambda s: s["kind"] == F.lit("text")),
                    lambda a, b: F.when(a["offset"] < b["offset"], -1)
                    .when(a["offset"] > b["offset"], 1)
                    .otherwise(0),
                ),
                lambda s: s["text"],
            ),
            "",
        ).alias("out_text")
    return out.select("doc_id", _REWRITTEN_TEXT_COL)


# --- byte-weighted skew rebalancing ---------------------------------------


def with_doc_bytes(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "_bytes",
        F.aggregate(
            "spans",
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
        ),
    )


def bucketed(docs: DataFrame, n_buckets: int, byte_weighted: bool = False) -> DataFrame:
    """Assign a deterministic bucket per document.

    hash mode: pmod(xxhash64(doc_id), n) — uniform in doc COUNT, no extra
    shuffle beyond the bucketing itself.
    byte_weighted mode: documents are dealt round-robin in size order
    (greedy LPT approximation) — balances BYTES when 1% of docs are
    50-1000x base size. Scale-safe: the deal runs independently inside
    (size-stratum, salt) groups — stratum = decimal-digit-count of the
    byte size (docs within 10x of each other), salt = one md5 hex digit
    of doc_id (16-way split) — so the row_number window is PARTITIONED
    (hash exchange, parallel tasks), never a single-partition global
    sort. Each group's deal start is rotated by (stratum*16 + salt) so
    remainder rows don't pile onto bucket 0. Deterministic (md5 +
    row_number over a total order), so the DuckDB oracle reproduces it
    exactly."""
    if not byte_weighted:
        return docs.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )
    from pyspark.sql.window import Window

    sized = with_doc_bytes(docs)
    keyed = sized.withColumn(
        # digit-count stratum: exact in any engine (no float log2 at
        # power-of-two boundaries), groups sizes within 10x
        "_stratum", F.length(F.col("_bytes").cast("string")).cast("int")
    ).withColumn(
        "_salt", F.conv(F.substring(F.md5("doc_id"), 1, 1), 16, 10).cast("int")
    )
    w = Window.partitionBy("_stratum", "_salt").orderBy(
        F.desc("_bytes"), F.col("doc_id")
    )
    return (
        keyed.withColumn("_rank", F.row_number().over(w))
        .withColumn(
            "bucket",
            (
                (F.col("_rank") - 1 + F.col("_stratum") * 16 + F.col("_salt"))
                % n_buckets
            ).cast("int"),
        )
        .drop("_rank", "_bytes", "_stratum", "_salt")
    )


# --- resumable run with lineage + metrics ----------------------------------


class PipelineResult:
    def __init__(self, output_path, lineage_path, metrics_path):
        self.output_path = output_path
        self.lineage_path = lineage_path
        self.metrics_path = metrics_path


class ParquetSink:
    """Default sink: bucket-partitioned parquet with dynamic partition
    overwrite (per-bucket idempotent rewrite on resume)."""

    def __init__(self, output_dir: str):
        self.output_path = f"{output_dir}/documents"
        self.lineage_path = f"{output_dir}/lineage"
        self.metrics_path = f"{output_dir}/metrics"

    def prepare(self, spark):
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )

    def write_documents(self, df):
        df.write.mode("overwrite").partitionBy("bucket").parquet(
            self.output_path
        )

    def read_documents(self, spark):
        spark.catalog.refreshByPath(self.output_path)
        return spark.read.parquet(self.output_path)

    def write_aux(self, df, path):
        df.write.mode("overwrite").parquet(path)
        df.sparkSession.catalog.refreshByPath(path)

    def read_lineage(self, spark):
        return spark.read.parquet(self.lineage_path)


class IcebergSink:
    """Iceberg sink seam (SURVEY §1.2/§4): same contract as ParquetSink
    but writing through the DataFrameWriterV2 API into catalog tables.

    The table is partitioned by the pipeline's OWN ``bucket`` column
    (identity partition), NOT by Iceberg's hidden bucket(doc_id)
    transform: resume correctness requires that overwritePartitions()
    replaces exactly the resume buckets present in the incoming frame.
    A hidden murmur3 bucket(doc_id) transform would not align with the
    pipeline's pmod(xxhash64(doc_id)) buckets, so a resumed run's
    remainder docs would scatter across (and overwrite) partitions
    holding completed documents.

    This container ships no Iceberg runtime jars (CLAUDE.md), so the
    class is exercised by a skip-if-missing test; with
    spark.sql.catalog.* configured it drops in via
    run_pipeline(..., sink=IcebergSink(\"catalog.db.docs\"))."""

    def __init__(self, table: str):
        self.output_path = table
        self.lineage_path = f"{table}_lineage"
        self.metrics_path = f"{table}_metrics"

    def prepare(self, spark):
        pass

    def write_documents(self, df):
        spark = df.sparkSession
        if not spark.catalog.tableExists(self.output_path):
            # identity partition on the resume bucket column: aligned
            # with the lineage anti-join and dynamic-overwrite contract
            df.writeTo(self.output_path).partitionedBy("bucket").create()
        else:
            df.writeTo(self.output_path).overwritePartitions()

    def read_documents(self, spark):
        return spark.read.table(self.output_path)

    def write_aux(self, df, path):
        df.writeTo(path).createOrReplace()

    def read_lineage(self, spark):
        return spark.read.table(self.lineage_path)


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    config="default",
    handlers_factory=None,
    n_buckets: int = 64,
    byte_weighted: bool = False,
    resume: bool = True,
    sink=None,
) -> PipelineResult:
    """Checkpoint-resumable rewrite: output partitioned by a
    deterministic doc_id bucket + per-bucket lineage + stage metrics.

    ``sink`` is the storage strategy (default ParquetSink(output_dir);
    pass IcebergSink(\"catalog.db.table\") on a cluster with Iceberg
    jars). On restart, buckets recorded 'ok' in lineage are anti-joined
    away and only the remainder is recomputed (dynamic partition
    overwrite / overwritePartitions keeps completed buckets intact)."""
    if sink is None:
        sink = ParquetSink(output_dir)
    out_path = sink.output_path
    lineage_path = sink.lineage_path
    metrics_path = sink.metrics_path
    sink.prepare(spark)

    b = bucketed(docs, n_buckets, byte_weighted=byte_weighted)

    done = None
    if resume:
        try:
            done = (
                sink.read_lineage(spark)
                .where(F.col("status") == "ok")
                .select("partition_id")
                .distinct()
            )
        except Exception:
            done = None
    if done is not None:
        # broadcast anti-join: lineage is tiny relative to the corpus
        b = b.join(
            F.broadcast(done),
            b["bucket"] == done["partition_id"],
            "left_anti",
        )

    t0 = time.time()
    b = b.repartition(n_buckets, "bucket")
    rewritten = b.mapInArrow(
        make_rewrite_fn(config, handlers_factory), schema=b.schema
    )
    sink.write_documents(rewritten)
    wall_ms = int((time.time() - t0) * 1000)

    # lineage + metrics derived from the committed output (consistent
    # with what actually landed)
    out_df = sink.read_documents(spark)
    lineage = out_df.groupBy(F.col("bucket").cast("int").alias("partition_id")).agg(
        F.count("*").alias("doc_count"),
        F.sha2(
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))), 256
        ).alias("checksum"),
        F.lit("ok").alias("status"),
        F.lit(1).alias("attempt"),
        F.current_timestamp().alias("ts"),
    )
    sink.write_aux(lineage, lineage_path)

    metrics = out_df.groupBy(F.col("bucket").cast("int").alias("partition_id")).agg(
        F.count("*").alias("docs"),
        F.sum(
            F.aggregate(
                "spans", F.lit(0).cast("bigint"),
                lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
            )
        ).alias("bytes_out"),
    ).select(
        F.lit("rewrite").alias("stage"),
        "partition_id",
        "docs",
        F.lit(None).cast("long").alias("bytes_in"),
        "bytes_out",
        F.lit(wall_ms).alias("wall_ms"),
    )
    sink.write_aux(metrics, metrics_path)
    return PipelineResult(out_path, lineage_path, metrics_path)


def _collect_links(docs: DataFrame, collector_name: str) -> DataFrame:
    """Per-document link extraction via an attribute-selector handler
    from selma_spark.extract (named so the closure ships by name, not by
    pickled class): one streaming parse per document inside mapInArrow,
    rows out as (doc_id, n_links, hrefs_csv). Narrow plan — the
    distributed twin of the reference's attribute-matching handler
    surface (test/selma_rewriter_match_attribute_test.rb).

    The Rewriter (handler compile + dispatch table) is built ONCE PER
    TASK; only the collector's accumulator state is reset per document
    (the per-doc Rewriter.__init__ was a measurable tax on small-doc
    corpora — VERDICT r2 #3; the flagship path at make_rewrite_fn is the
    template)."""
    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def fn(batches):
        import pyarrow as pa  # noqa: PLC0415

        from selma_spark import extract  # noqa: PLC0415
        from selma_spark.rewriter import Rewriter  # noqa: PLC0415

        col = getattr(extract, collector_name)()
        rw = Rewriter(sanitizer=None, handlers=[col]).rewrite
        for batch in batches:
            doc_ids = batch.column(batch.schema.get_field_index("doc_id"))
            lst = batch.column(batch.schema.get_field_index("spans"))
            values = lst.values
            kinds = values.field("kind").to_pylist()
            texts = values.field("text").to_pylist()
            offsets = lst.offsets.to_pylist()
            n_links, hrefs_csv = [], []
            for i in range(len(batch)):
                lo, hi = offsets[i], offsets[i + 1]
                html = "".join(
                    t for k, t in zip(kinds[lo:hi], texts[lo:hi])
                    if k == "text" and t
                )
                col.reset()
                rw(html)
                n_links.append(len(col.hrefs))
                hrefs_csv.append(",".join(col.hrefs))
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(n_links, type=pa.int32()),
                 pa.array(hrefs_csv, type=pa.string())],
                names=["doc_id", "n_links", "hrefs_csv"],
            )

    return docs.mapInArrow(
        fn, schema="doc_id string, n_links int, hrefs_csv string"
    )


def extract_links(docs: DataFrame) -> DataFrame:
    """Every a[href] per document (LinkCollector)."""
    return _collect_links(docs, "LinkCollector")


def collect_scoped_text(docs: DataFrame) -> DataFrame:
    """Per-document text-chunk collection through the
    match_text_within="div" / ignore_text_within=["b"] dispatch
    (ScopedTextCollector): one streaming parse per document inside
    mapInArrow, rows out as (doc_id, n_chunks, chunks_csv). Narrow plan;
    Rewriter built once per task, collector state reset per document."""
    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def fn(batches):
        import pyarrow as pa  # noqa: PLC0415

        from selma_spark.extract import ScopedTextCollector  # noqa: PLC0415
        from selma_spark.rewriter import Rewriter  # noqa: PLC0415

        col = ScopedTextCollector()
        rw = Rewriter(sanitizer=None, handlers=[col]).rewrite
        for batch in batches:
            doc_ids = batch.column(batch.schema.get_field_index("doc_id"))
            lst = batch.column(batch.schema.get_field_index("spans"))
            values = lst.values
            kinds = values.field("kind").to_pylist()
            texts = values.field("text").to_pylist()
            offsets = lst.offsets.to_pylist()
            n_chunks, chunks_csv = [], []
            for i in range(len(batch)):
                lo, hi = offsets[i], offsets[i + 1]
                html = "".join(
                    t for k, t in zip(kinds[lo:hi], texts[lo:hi])
                    if k == "text" and t
                )
                col.reset()
                rw(html)
                n_chunks.append(len(col.chunks))
                chunks_csv.append("|".join(col.chunks))
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(n_chunks, type=pa.int32()),
                 pa.array(chunks_csv, type=pa.string())],
                names=["doc_id", "n_chunks", "chunks_csv"],
            )

    return docs.mapInArrow(
        fn, schema="doc_id string, n_chunks int, chunks_csv string"
    )


def extract_external_links(docs: DataFrame) -> DataFrame:
    """Absolute http(s) links excluding class="anchor" decorations:
    ``a[href^="http"]:not([class="anchor"])`` through the distributed
    path (ExternalLinkCollector)."""
    return _collect_links(docs, "ExternalLinkCollector")


def density_extract_stats(docs: DataFrame) -> DataFrame:
    """Main-content extraction stats via the boilerpipe-style
    DensityTextExtractor (extract.py): per document, concatenate text
    spans, run ONE streaming parse with FRESH per-document extractor
    state (reset()), and report accepted-block stats. Narrow plan; the
    Rewriter itself is built once per task (VERDICT r2 #3)."""
    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def fn(batches):
        import pyarrow as pa  # noqa: PLC0415

        from selma_spark.extract import DensityTextExtractor  # noqa: PLC0415
        from selma_spark.rewriter import Rewriter  # noqa: PLC0415

        ex = DensityTextExtractor()
        rw = Rewriter(sanitizer=None, handlers=[ex]).rewrite
        for batch in batches:
            doc_ids = batch.column(batch.schema.get_field_index("doc_id"))
            lst = batch.column(batch.schema.get_field_index("spans"))
            values = lst.values
            kinds = values.field("kind").to_pylist()
            texts = values.field("text").to_pylist()
            offsets = lst.offsets.to_pylist()
            n_blocks, main_chars = [], []
            for i in range(len(batch)):
                lo, hi = offsets[i], offsets[i + 1]
                html = "".join(
                    t for k, t in zip(kinds[lo:hi], texts[lo:hi])
                    if k == "text" and t
                )
                ex.reset()
                rw(html)
                n_blocks.append(len(ex.blocks))
                main_chars.append(len(ex.main_text))
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(n_blocks, type=pa.int32()),
                 pa.array(main_chars, type=pa.int64())],
                names=["doc_id", "n_blocks", "main_chars"],
            )

    return docs.mapInArrow(
        fn, schema="doc_id string, n_blocks int, main_chars bigint"
    )
