"""Structured Streaming path: micro-batch rewrite equals the batch
pipeline; watermarked windowed aggregation over events."""

import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from selma_spark.spark.datagen import interleaved_spans
from selma_spark.spark.pipeline import rewrite_documents
from selma_spark.spark.streaming import (
    stream_event_metrics,
    stream_rewrite,
    windowed_event_metrics,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("selma-streaming-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_stream_rewrite_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="selma_stream_")
    try:
        docs = interleaved_spans(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        )
        # stage input as several files so multiple micro-batches fire
        docs.repartition(4).write.parquet(f"{tmp}/in")
        q = stream_rewrite(
            spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt", config="default"
        )
        q.awaitTermination(120)
        q.stop()

        streamed = spark.read.parquet(f"{tmp}/out/documents")
        batch = rewrite_documents(docs, "default")
        assert streamed.count() == docs.count()
        # value equality, order-insensitive
        s_out = streamed.select("doc_id", "spans")
        assert s_out.exceptAll(batch).count() == 0
        assert batch.exceptAll(s_out).count() == 0

        lineage = spark.read.parquet(f"{tmp}/out/lineage")
        assert lineage.agg(F.sum("doc_count")).collect()[0][0] == docs.count()
        assert lineage.where("status = 'ok'").count() == lineage.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_event_metrics_batch_semantics(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    agg = windowed_event_metrics(events)
    rows = agg.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    # window bounds are 10-minute aligned
    for r in rows[:20]:
        assert r["window_start"].minute % 10 == 0


def test_stream_event_metrics_end_to_end(spark):
    tmp = tempfile.mkdtemp(prefix="selma_stream_ev_")
    try:
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        events.repartition(3).write.parquet(f"{tmp}/in")
        q = stream_event_metrics(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
        q.awaitTermination(120)
        q.stop()
        out = spark.read.parquet(f"{tmp}/out")
        # append mode only emits windows sealed by the watermark; the
        # final (max-ts) windows stay open, so emitted <= batch total
        batch_total = events.count()
        emitted = out.agg(F.sum("n_events")).collect()[0][0] or 0
        assert 0 < emitted <= batch_total
        assert set(out.columns) == {
            "window_start", "window_end", "event_type", "n_events", "value_sum"
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_running_totals(spark):
    tmp = tempfile.mkdtemp(prefix="selma_stateful_")
    try:
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        # several input files so state must survive micro-batch boundaries
        events.repartition(6).write.parquet(f"{tmp}/in")
        from selma_spark.spark.streaming import stream_running_event_totals

        q = stream_running_event_totals(
            spark, f"{tmp}/in", f"{tmp}/ckpt", query_name="rt_test"
        )
        q.awaitTermination(120)
        q.stop()
        # update-mode memory sink: the LAST row per event_type is the
        # final running total and must equal the batch aggregate
        out = spark.sql(
            "SELECT event_type, max(n_events) AS n FROM rt_test GROUP BY 1"
        ).collect()
        got = {r["event_type"]: r["n"] for r in out}
        want = {
            r["event_type"]: r["n"]
            for r in events.groupBy("event_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_rewrite_resumes_from_checkpoint(spark):
    """Checkpoint-resume: stop the stream, land NEW files, restart with
    the SAME checkpoint — already-processed files are not reprocessed
    and the combined output covers exactly the union of doc_ids."""
    tmp = tempfile.mkdtemp(prefix="selma_stream_resume_")
    in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        docs = interleaved_spans(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        )
        first = docs.where(F.col("doc_id").cast("bigint") < 100)
        second = docs.where(
            (F.col("doc_id").cast("bigint") >= 100)
            & (F.col("doc_id").cast("bigint") < 200)
        )
        first.write.parquet(f"{in_dir}/part1")
        q = stream_rewrite(spark, f"{in_dir}/*", out_dir, ckpt, "default")
        q.awaitTermination()
        got1 = spark.read.parquet(f"{out_dir}/documents")
        n1 = got1.count()
        assert n1 == first.count()

        second.write.parquet(f"{in_dir}/part2")
        q2 = stream_rewrite(spark, f"{in_dir}/*", out_dir, ckpt, "default")
        q2.awaitTermination()
        got = spark.read.parquet(f"{out_dir}/documents")
        ids = [r["doc_id"] for r in got.select("doc_id").collect()]
        assert len(ids) == len(set(ids)) == 200  # no reprocessing dupes
        # lineage recorded one row per micro-batch, all ok
        lin = spark.read.parquet(f"{out_dir}/lineage")
        assert lin.where(F.col("status") == "ok").count() == lin.count()
        assert lin.agg(F.sum("doc_count")).collect()[0][0] == 200
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_near_dup_flags(spark):
    """Near-identical docs arriving in DIFFERENT micro-batches are
    flagged against the earlier doc (state survives the batch
    boundary); identical docs within ONE batch flag the later one
    against the earlier; unrelated docs stay unflagged. Cross-checked
    against the batch simhash path: the flagged pairs' hamming distance
    must be <= 3 by textops.simhash64 on the same texts."""
    import datetime
    import pathlib

    from selma_spark.spark import textops
    from selma_spark.spark.streaming import stream_near_dup_flags

    tmp = tempfile.mkdtemp(prefix="selma_snear_")
    try:
        inp, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
        pathlib.Path(inp).mkdir(parents=True)
        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
        base = (
            "the quick brown fox jumps over the lazy dog while seventeen "
            "sailors navigate treacherous northern waters seeking safe "
            "harbor before the winter storms arrive in earnest"
        )
        other = (
            "completely unrelated quarterly revenue figures demonstrate "
            "sustained growth across emerging markets despite currency "
            "headwinds and persistent supply chain disruptions worldwide"
        )
        schema = "doc_id string, text string, ingest_ts timestamp"
        # batch 1: the original + an unrelated doc
        spark.createDataFrame(
            [("a", base, t0), ("c", other, t0)], schema
        ).coalesce(1).write.mode("append").parquet(f"{inp}/f1")
        # batch 2: an exact re-send of base (hamming 0 vs a) + a fresh
        # within-batch identical pair (d, e)
        spark.createDataFrame(
            [("b", base, t0), ("d", other + " appendix", t0),
             ("e", other + " appendix", t0)],
            schema,
        ).coalesce(1).write.mode("append").parquet(f"{inp}/f2")

        q = stream_near_dup_flags(
            spark, f"{inp}/*", ckpt, query_name="snear_test"
        )
        q.awaitTermination(120)
        q.stop()

        rows = spark.sql(
            "SELECT doc_id, min(near_dup_of) AS dup_of, "
            "count(near_dup_of) AS n_hits FROM snear_test GROUP BY 1"
        ).collect()
        got = {r["doc_id"]: (r["dup_of"], r["n_hits"]) for r in rows}
        assert got["a"][1] == 0          # first arrival: clean
        assert got["c"][1] == 0          # unrelated: clean
        assert got["b"][0] == "a" and got["b"][1] > 0   # cross-batch dup
        assert got["d"][1] == 0          # earlier of the in-batch pair
        assert got["e"][0] == "d" and got["e"][1] > 0   # in-batch dup

        # batch-path consistency: simhash hamming of flagged pairs <= 3
        sh = {
            r["doc_id"]: r["simhash"]
            for r in textops.simhash64(
                spark.createDataFrame(
                    [("a", base), ("b", base),
                     ("d", other + " appendix"), ("e", other + " appendix")],
                    "doc_id string, text string",
                )
            ).collect()
        }
        for x, y in (("a", "b"), ("d", "e")):
            assert ((sh[x] ^ sh[y]) & 0xFFFFFFFFFFFFFFFF).bit_count() <= 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_near_dup_state_ttl_evicts_idle_buckets(spark):
    """Bounded state, part 2: a band bucket idle past the TTL is
    evicted (processing-time timeout), so a duplicate arriving AFTER
    the horizon is NOT flagged — mirroring
    dropDuplicatesWithinWatermark's bounded-memory contract."""
    import datetime
    import pathlib

    from selma_spark.spark.streaming import stream_near_dup_flags

    tmp = tempfile.mkdtemp(prefix="selma_snear_ttl_")
    try:
        inp, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
        pathlib.Path(inp).mkdir(parents=True)
        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"
        )
        schema = "doc_id string, text string, ingest_ts timestamp"
        # three files -> three micro-batches (maxFilesPerTrigger=1)
        spark.createDataFrame([("a", base, t0)], schema).coalesce(1) \
            .write.mode("append").parquet(f"{inp}/f1")
        spark.createDataFrame(
            [("z", "totally different interleaved filler words here", t0)],
            schema,
        ).coalesce(1).write.mode("append").parquet(f"{inp}/f2")
        spark.createDataFrame([("b", base, t0)], schema).coalesce(1) \
            .write.mode("append").parquet(f"{inp}/f3")

        q = stream_near_dup_flags(
            spark, f"{inp}/*", ckpt, query_name="snear_ttl_test",
            state_ttl_ms=1,
        )
        q.awaitTermination(120)
        q.stop()
        rows = spark.sql(
            "SELECT doc_id, count(near_dup_of) AS n_hits "
            "FROM snear_ttl_test GROUP BY 1"
        ).collect()
        got = {r["doc_id"]: r["n_hits"] for r in rows}
        # a's band state was evicted while batch f2 ran (idle > 1ms), so
        # the byte-identical re-send b is NOT flagged
        assert got["a"] == 0
        assert got["b"] == 0, got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_near_dup_event_time_eviction(spark):
    """EVENT-time horizon (VERDICT r4 #6): duplicates arriving within
    the event-time TTL are flagged; a duplicate whose ingest_ts is past
    the horizon is NOT — state expiry follows the DATA's clock, with no
    wall-clock sleeps anywhere in the test (deterministic by
    construction, unlike a processing-time TTL)."""
    import datetime
    import pathlib

    from selma_spark.spark.streaming import stream_near_dup_flags

    tmp = tempfile.mkdtemp(prefix="selma_snear_evt_")
    try:
        inp, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
        pathlib.Path(inp).mkdir(parents=True)
        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"
        )
        schema = "doc_id string, text string, ingest_ts timestamp"
        # f1: the original at t0
        spark.createDataFrame([("a", base, t0)], schema).coalesce(1) \
            .write.mode("append").parquet(f"{inp}/f1")
        # f2: an IN-horizon re-send (t0+30s < 60s ttl) + an unrelated doc
        # far in the future that drags the watermark past a's horizon
        spark.createDataFrame(
            [("c", base, t0 + datetime.timedelta(seconds=30)),
             ("z", "totally different interleaved filler words here",
              t0 + datetime.timedelta(minutes=10))],
            schema,
        ).coalesce(1).write.mode("append").parquet(f"{inp}/f2")
        # f3: a byte-identical re-send whose EVENT time is ~9.5 min past
        # the bucket's last activity — beyond the 60s event-time horizon
        spark.createDataFrame(
            [("b", base, t0 + datetime.timedelta(minutes=10))], schema
        ).coalesce(1).write.mode("append").parquet(f"{inp}/f3")

        q = stream_near_dup_flags(
            spark, f"{inp}/*", ckpt, query_name="snear_evt_test",
            state_ttl_ms=60_000, eviction="event",
        )
        q.awaitTermination(120)
        q.stop()
        rows = spark.sql(
            "SELECT doc_id, min(near_dup_of) AS dup_of, "
            "count(near_dup_of) AS n_hits FROM snear_evt_test GROUP BY 1"
        ).collect()
        got = {r["doc_id"]: (r["dup_of"], r["n_hits"]) for r in rows}
        assert got["a"][1] == 0                       # first arrival
        assert got["c"][0] == "a" and got["c"][1] > 0  # inside horizon
        assert got["z"][1] == 0                       # unrelated
        assert got["b"][1] == 0, got                  # past horizon: evicted
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dedup_documents(spark):
    """Duplicate payloads arriving across micro-batches inside the
    watermark horizon are suppressed; distinct payloads all land."""
    import pathlib

    from selma_spark.spark.streaming import stream_dedup_documents

    tmp = tempfile.mkdtemp(prefix="selma_sdedup_")
    try:
        inp, outp, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        pathlib.Path(inp).mkdir(parents=True)
        schema = (
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>, ingest_ts timestamp"
        )
        import datetime

        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
        rows1 = [
            ("a", [("text", "<b>same</b>", None, 0)], t0),
            ("b", [("text", "<i>other</i>", None, 0)], t0),
        ]
        # second file: one exact re-send (same payload, new doc_id) and
        # one genuinely new payload
        rows2 = [
            ("c", [("text", "<b>same</b>", None, 0)], t0),
            ("d", [("text", "<u>fresh</u>", None, 0)], t0),
        ]
        spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        q = stream_dedup_documents(spark, inp, outp, ckpt)
        q.awaitTermination(120)
        out = spark.read.parquet(outp)
        texts = sorted(
            r["spans"][0]["text"] for r in out.collect()
        )
        assert texts == ["<b>same</b>", "<i>other</i>", "<u>fresh</u>"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
