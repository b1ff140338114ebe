"""Structured Streaming ingest for the rewrite pipeline.

The reference has no cross-document streaming (its "streaming" is within
one document); this is the pipeline-added micro-batch ingest path
(SURVEY.md §2B): new span documents land in a directory (stand-in for an
Iceberg/queue source), each micro-batch runs the SAME vectorized rewrite
UDF, and ``foreachBatch`` writes output + lineage transactionally per
batch — so the streaming and batch paths share one code path and one
output contract.

Also provides watermarked windowed aggregation over the ``events``
stream (late-data tolerant throughput metrics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datagen import DOC_SCHEMA
from .pipeline import make_rewrite_fn


def read_document_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of span documents (parquet files appearing in
    input_dir). maxFilesPerTrigger bounds micro-batch size the way
    arrow batch rows bound UDF memory."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_rewrite(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    config="default",
    handlers_factory=None,
):
    """Continuously rewrite arriving documents. Returns the streaming
    query; callers stop() it or awaitTermination().

    foreachBatch gives exactly-once-per-batch output with the batch id
    recorded as lineage (restart-safe: Structured Streaming replays the
    failed batch and the write is idempotent by batch_id directory)."""
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    stream = read_document_stream(spark, input_dir)
    rewritten = stream.mapInArrow(
        make_rewrite_fn(config, handlers_factory), schema=stream.schema
    )

    out_path = f"{output_dir}/documents"
    lineage_path = f"{output_dir}/lineage"

    def write_batch(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        (
            batch_df.groupBy()
            .agg(
                F.lit(int(batch_id)).alias("partition_id"),
                F.count("*").alias("doc_count"),
                F.sha2(
                    F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))), 256
                ).alias("checksum"),
                F.lit("ok").alias("status"),
                F.lit(1).alias("attempt"),
                F.current_timestamp().alias("ts"),
            )
            .select("partition_id", "doc_count", "checksum", "status",
                    "attempt", "ts")
            .write.mode("append")
            .parquet(lineage_path)
        )

    return (
        rewritten.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_metrics(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window rollup over the events stream: count +
    value sum per (window, event_type); late events beyond the watermark
    are dropped deterministically."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def stream_event_metrics(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """File-source events stream -> watermarked windowed aggregation ->
    append-mode parquet sink (windows finalize when the watermark
    passes)."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    agg = windowed_event_metrics(events)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_documents(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Streaming exact-dedup: documents arriving within the watermark
    horizon are deduplicated on their content hash with
    dropDuplicatesWithinWatermark — the state store evicts hashes older
    than the watermark, so state is bounded (a plain dropDuplicates
    would grow state forever at corpus scale). Re-sends of the same
    payload across micro-batches inside the horizon are suppressed."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA + ", ingest_ts timestamp")
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    # per-span fingerprint covers kind + text + media_ref, with NULL
    # text disambiguated from '' (the same null-vs-empty collision fixed
    # in rewrite_documents_dedup) — two distinct media-only docs must
    # NOT collide and be dropped as duplicates
    span_fp = F.transform(
        "spans",
        lambda s: F.concat_ws(
            "\x01",
            F.coalesce(s["kind"], F.lit("")),
            F.when(s["text"].isNull(), F.lit("null:")).otherwise(
                F.concat(F.lit("md5:"), F.md5(s["text"]))
            ),
            F.coalesce(s["media_ref"], F.lit("")),
        ),
    )
    # NULL spans array must not collide with the empty array (both would
    # reduce to concat_ws('') otherwise) — same null-vs-empty class as
    # the per-span text marker above
    doc_fp = F.when(F.col("spans").isNull(), F.lit("nullspans:")).otherwise(
        F.concat(F.lit("spans:"), F.md5(F.concat_ws("\x00", span_fp)))
    )
    deduped = (
        stream.withColumn("_h", doc_fp)
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --- streaming near-dup (stateful simhash banding) ---------------------------

NEAR_DUP_MAX_HAMMING = 3
# bounded-state discipline (same philosophy as the batch pigeonhole
# cap): a band bucket holding this many signatures is an exact-dup
# mega-cluster, not near-dup territory — stop growing its state
NEAR_DUP_MAX_BAND_STATE = 100
NEAR_DUP_STATE_SCHEMA = (
    "doc_ids array<string>, sims array<bigint>, ttl_ms bigint"
)
# event-time variant adds the bucket's last-seen EVENT time so arrivals
# can prune a bucket whose horizon passed without an intervening batch
NEAR_DUP_EVENT_STATE_SCHEMA = (
    "doc_ids array<string>, sims array<bigint>, ttl_ms bigint, "
    "last_ts_ms bigint"
)
NEAR_DUP_OUTPUT_SCHEMA = "doc_id string, band_id int, near_dup_of string"


# state TTL: a band bucket idle this long is evicted (bounded-state
# horizon, the stateful-op analogue of dropDuplicatesWithinWatermark's
# watermark). Module-level so the pickled state fn can read it; the
# builder overrides it per query via the _ttl_ms closure column instead
# of mutating globals.
NEAR_DUP_STATE_TTL_MS = 30 * 60 * 1000


def _near_dup_band_fn(key, pdf_iter, state):
    """applyInPandasWithState function for one (band_id, band_val)
    bucket: match each arriving signature against the bucket's stored
    signatures (state) AND earlier arrivals in the same batch, flag
    hamming <= NEAR_DUP_MAX_HAMMING. Arrivals are processed in doc_id
    order so within-batch pairing is deterministic regardless of task
    scheduling. Hamming uses an unsigned-64 mask before bit_count —
    Python's int.bit_count is sign-magnitude, not two's-complement.

    State is DOUBLY bounded: capped at NEAR_DUP_MAX_BAND_STATE
    signatures per bucket, and evicted wholesale after the bucket has
    been idle for its TTL (processing-time timeout — each data batch
    re-arms it). A timed-out invocation sees no input rows and only
    removes the state."""
    import pandas as pd  # noqa: PLC0415

    band_id = int(key[0])
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=["doc_id", "band_id", "near_dup_of"])
        return
    if state.exists:
        doc_ids, sims, ttl_ms = state.get
        doc_ids, sims = list(doc_ids), list(sims)
    else:
        doc_ids, sims, ttl_ms = [], [], None
    batch = []
    for pdf in pdf_iter:
        if ttl_ms is None and "_ttl_ms" in pdf.columns and len(pdf):
            ttl_ms = int(pdf["_ttl_ms"].iloc[0])
        for doc_id, sim in zip(pdf["doc_id"], pdf["simhash"]):
            batch.append((str(doc_id), int(sim)))
    batch.sort()
    rows = _match_and_absorb(batch, doc_ids, sims, band_id)
    if ttl_ms is None:
        ttl_ms = NEAR_DUP_STATE_TTL_MS
    state.update((doc_ids, sims, int(ttl_ms)))
    state.setTimeoutDuration(int(ttl_ms))
    yield pd.DataFrame(rows, columns=["doc_id", "band_id", "near_dup_of"])


def _match_and_absorb(batch, doc_ids, sims, band_id):
    """Shared matcher for both eviction modes: flag each arrival against
    the bucket's stored signatures AND earlier same-batch arrivals,
    absorbing new signatures in-place up to the cap. A re-sent/replayed
    doc_id must not burn a cap slot — duplicate entries would evict room
    for genuinely distinct signatures in hot buckets (ADVICE r4 #1)."""
    seen = set(doc_ids)  # O(1) replay check alongside the ordered lists
    rows = []
    for doc_id, sim in batch:
        match = None
        for od, osim in zip(doc_ids, sims):
            if od == doc_id:
                continue
            if ((sim ^ osim) & 0xFFFFFFFFFFFFFFFF).bit_count() \
                    <= NEAR_DUP_MAX_HAMMING and (match is None or od < match):
                match = od
        rows.append((doc_id, band_id, match))
        if doc_id not in seen and len(doc_ids) < NEAR_DUP_MAX_BAND_STATE:
            doc_ids.append(doc_id)
            sims.append(sim)
            seen.add(doc_id)
    return rows


def _near_dup_band_fn_event(key, pdf_iter, state):
    """EVENT-time twin of _near_dup_band_fn (VERDICT r4 #6): the bucket
    horizon is measured in the data's own ``ingest_ts``, like
    stream_dedup_documents' watermark, not in wall-clock. Eviction is
    double-pathed and fully deterministic:

    1. timer path — the timeout TIMESTAMP is (last event ts + ttl); when
       the stream's watermark passes it with no new data for the bucket,
       the timed-out invocation removes the state wholesale;
    2. arrival path — a batch whose EARLIEST event time is beyond
       (last_ts + ttl) clears the inherited signatures before matching,
       because Spark does not fire a group's timer in a batch where that
       group also has data: without this check a late re-send arriving
       exactly when the timer should have fired would still match
       horizon-expired state.
    """
    import pandas as pd  # noqa: PLC0415

    band_id = int(key[0])
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=["doc_id", "band_id", "near_dup_of"])
        return
    if state.exists:
        doc_ids, sims, ttl_ms, last_ts_ms = state.get
        doc_ids, sims = list(doc_ids), list(sims)
    else:
        doc_ids, sims, ttl_ms, last_ts_ms = [], [], None, None
    batch = []
    batch_min_ts = batch_max_ts = None
    for pdf in pdf_iter:
        if ttl_ms is None and "_ttl_ms" in pdf.columns and len(pdf):
            ttl_ms = int(pdf["_ttl_ms"].iloc[0])
        for doc_id, sim, ts in zip(
            pdf["doc_id"], pdf["simhash"], pdf["ingest_ts"]
        ):
            ts_ms = int(pd.Timestamp(ts).value // 1_000_000)
            batch.append((str(doc_id), int(sim)))
            if batch_min_ts is None or ts_ms < batch_min_ts:
                batch_min_ts = ts_ms
            if batch_max_ts is None or ts_ms > batch_max_ts:
                batch_max_ts = ts_ms
    if ttl_ms is None:
        ttl_ms = NEAR_DUP_STATE_TTL_MS
    if (
        last_ts_ms is not None
        and batch_min_ts is not None
        and batch_min_ts - int(last_ts_ms) > int(ttl_ms)
    ):
        doc_ids, sims = [], []  # horizon passed: expire inherited state
    batch.sort()
    rows = _match_and_absorb(batch, doc_ids, sims, band_id)
    new_last = max(int(last_ts_ms or 0), int(batch_max_ts or 0))
    state.update((doc_ids, sims, int(ttl_ms), new_last))
    state.setTimeoutTimestamp(new_last + int(ttl_ms))
    yield pd.DataFrame(rows, columns=["doc_id", "band_id", "near_dup_of"])


def stream_near_dup_flags(
    spark: SparkSession, input_dir: str, checkpoint_dir: str,
    query_name: str = "near_dup_flags",
    state_ttl_ms: int | None = None,
    eviction: str = "processing",
):
    """Streaming NEAR-duplicate detection (VERDICT r3 #7, beyond the
    exact dedup above): per micro-batch, each document's 64-bit simhash
    (the SAME JVM-side SQL expression as the batch path) is split into
    4x16-bit pigeonhole bands; a band-keyed stateful operator
    (applyInPandasWithState) matches arrivals against the signatures
    already seen in that band bucket, across AND within micro-batches.
    Any pair within hamming 3 agrees exactly on >= 1 band, so banding
    loses no candidates while keying state by (band_id, band_val) keeps
    each state cell tiny and the shuffle an equi-partition on the band
    key — the same scale shape as the batch simhash_near_dup join.
    State per cell is DOUBLY bounded: capped signature count (saturated
    cells are exact-dup territory) AND a processing-time TTL
    (``state_ttl_ms``, default NEAR_DUP_STATE_TTL_MS) that evicts idle
    buckets — the stateful-op analogue of
    dropDuplicatesWithinWatermark's horizon.

    ``eviction`` picks the horizon clock (VERDICT r4 #6): "processing"
    (default) evicts on wall-clock idleness; "event" measures the
    horizon in the data's own ingest_ts — a watermark-bounded
    EventTimeTimeout like stream_dedup_documents, deterministic under
    replay/backfill where wall-clock TTLs are not (a backfill that
    pauses 31 wall-minutes mid-stream would spuriously evict every
    bucket in processing mode).
    A doc is a near-dup iff ANY of its 4 band rows carries a non-null
    near_dup_of (aggregate downstream). Update-mode in-memory sink."""
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    from .shipping import ensure_shipped  # noqa: PLC0415
    from .textops import _SIMHASH64_EXPR  # noqa: PLC0415

    if eviction not in ("processing", "event"):
        raise ValueError("eviction must be 'processing' or 'event'")
    ensure_shipped(spark)
    docs = (
        spark.readStream.schema("doc_id string, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    ttl_ms = (
        int(state_ttl_ms) if state_ttl_ms is not None
        else NEAR_DUP_STATE_TTL_MS
    )
    sh = docs.select(
        "doc_id",
        "ingest_ts",
        F.expr(_SIMHASH64_EXPR).alias("simhash"),
        F.lit(ttl_ms).alias("_ttl_ms"),
    )
    if eviction == "event":
        # EventTimeTimeout requires a watermark on the grouped stream;
        # the horizon itself doubles as the allowed lateness
        sh = sh.withWatermark("ingest_ts", f"{ttl_ms} milliseconds")
    bands = sh.select(
        "doc_id",
        "simhash",
        "_ttl_ms",
        "ingest_ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        F.shiftright(F.col("simhash"), 16 * k)
                        .bitwiseAND(F.lit(65535))
                        .alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id", "simhash", "_ttl_ms", "ingest_ts", "b.band_id", "b.band_val"
    )
    if eviction == "event":
        flags = bands.groupBy("band_id", "band_val").applyInPandasWithState(
            _near_dup_band_fn_event,
            outputStructType=NEAR_DUP_OUTPUT_SCHEMA,
            stateStructType=NEAR_DUP_EVENT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    else:
        flags = bands.groupBy("band_id", "band_val").applyInPandasWithState(
            _near_dup_band_fn,
            outputStructType=NEAR_DUP_OUTPUT_SCHEMA,
            stateStructType=NEAR_DUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    return (
        flags.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --- custom stateful operator ------------------------------------------------

STATE_SCHEMA = "n_events bigint, value_sum double"
RUNNING_OUTPUT_SCHEMA = (
    "event_type string, n_events bigint, value_sum double"
)


def _running_totals_fn(key, pdf_iter, state):
    """applyInPandasWithState function: per event_type running totals that
    survive micro-batch boundaries (the custom-stateful-operator shape —
    arbitrary Python state + arrow-batched input)."""
    import pandas as pd  # noqa: PLC0415

    if state.exists:
        n, vs = state.get
    else:
        n, vs = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        vs += float(pdf["value"].sum())
    state.update((n, vs))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "value_sum": [round(vs, 2)]}
    )


def stream_running_event_totals(
    spark: SparkSession, input_dir: str, checkpoint_dir: str,
    query_name: str = "running_totals",
):
    """File-source events stream -> stateful per-type running totals via
    applyInPandasWithState (update mode, in-memory sink for inspection)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    totals = events.groupBy("event_type").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
