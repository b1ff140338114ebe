"""Round-6 optimization measurement harness (guide §1: measure first).

NOT part of the frozen bench contract — bench.py is the driver's
measurement; this file exists to isolate component costs with the noop
sink (guide §1.4) and label jobs (§1.5) so OPTIMIZATION_r06.md can cite
real numbers for each operator examined.

Sections (select with SELMA_EXTRA_SECTIONS=comma-list; default all):
  flagship   — flagship rewrite vs identity-UDF floor (arrow-boundary cost)
  neardup    — near_dup_verified chain split: sig frame / candidates / verify
  simhash    — simhash64 signature pass vs full near-dup chain
  clusters   — near_dup_clusters wall + round count
  kmeans     — kmeans_refined_assign (refine loop + final assign)

Corpus scale mirrors bench.py's soak x64 point by default
(SELMA_EXTRA_REPLICATE, default 64) on $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from selma_spark.spark import queries as q  # noqa: E402
from selma_spark.spark import simsearch, textops  # noqa: E402
from selma_spark.spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SELMA_EXTRA_REPLICATE", "64"))
SECTIONS = set(
    os.environ.get(
        "SELMA_EXTRA_SECTIONS", "flagship,neardup,simhash,clusters,kmeans"
    ).split(",")
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, spark, fn, reps=2):
    """min-of-N timing with a job description label (§1.5); this host
    throttles in multi-minute phases, so single samples swing 2x."""
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        if best is None or dt < best:
            best = dt
    print(f"# {label}: {best:.2f}s", file=sys.stderr)
    return round(best, 2)


def soak_docs(spark):
    from bench import _soak_documents

    return _soak_documents(
        q.load(spark, SF_DIR, "documents"), REPLICATE, 4 * CPUS
    ).localCheckpoint()


def main():
    out = {"sf": SF_DIR, "replicate": REPLICATE, "cpus": CPUS}
    spark = get_spark(cpus=CPUS, app_name="selma-bench-extra",
                      arrow_batch_rows=16384)

    if "flagship" in SECTIONS:
        from selma_spark.spark.datagen import bench_spans
        from selma_spark.spark.pipeline import rewrite_documents

        docs = bench_spans(
            q.load(spark, SF_DIR, "documents"), replicate=REPLICATE,
            n_partitions=4 * CPUS,
        )
        # identity floor: same mapInArrow shape, rw replaced by identity
        # (config None, no handlers is invalid; use a passthrough handler-
        # free no-sanitizer path by mapping the batches unchanged)
        def identity(batches):
            yield from batches

        floor = docs.mapInArrow(identity, schema=docs.schema)
        agg = lambda d: d.select(  # noqa: E731
            F.sum(F.aggregate(
                "spans", F.lit(0).cast("bigint"),
                lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
            ))
        ).collect()
        agg(floor)  # warm
        out["flagship_floor_identity"] = timed(
            "flagship: identity mapInArrow floor", spark, lambda: agg(floor)
        )
        full = rewrite_documents(docs, "relaxed")
        out["flagship_full"] = timed(
            "flagship: relaxed rewrite", spark, lambda: agg(full)
        )

    docs = None
    if SECTIONS & {"neardup", "simhash", "clusters"}:
        docs = soak_docs(spark)
        out["docs"] = docs.count()

    if "neardup" in SECTIONS:
        out["sig_frame_build"] = timed(
            "neardup: signature frame (shingles + 4x md5-min) build",
            spark,
            lambda: noop(
                textops._lsh_signature_frame(docs, with_shingles=True)
            ),
        )
        sig = textops._lsh_signature_frame(docs, with_shingles=True)
        out["candidates_from_sig"] = timed(
            "neardup: band join candidates (sig prebuilt)",
            spark,
            lambda: noop(textops.near_dup_pairs(docs, sig=sig, ordered=False)),
        )
        out["verified_full"] = timed(
            "neardup: near_dup_verified end-to-end",
            spark,
            lambda: textops.near_dup_verified(docs).count(),
        )

    if "simhash" in SECTIONS:
        out["simhash64_pass"] = timed(
            "simhash: signature pass only", spark,
            lambda: noop(
                docs.select("doc_id", F.expr(textops._SIMHASH64_EXPR)
                            .alias("simhash"))
            ),
        )
        out["simhash_near_dup_full"] = timed(
            "simhash: near-dup chain end-to-end", spark,
            lambda: textops.simhash_near_dup(docs).count(),
        )

    if "clusters" in SECTIONS:
        out["near_dup_clusters_full"] = timed(
            "clusters: near_dup_clusters end-to-end", spark,
            lambda: textops.near_dup_clusters(docs)
            .agg(F.countDistinct("cluster_id")).collect(),
            reps=1,
        )

    if "kmeans" in SECTIONS:
        from bench import _soak_embeddings

        emb = _soak_embeddings(
            q.load(spark, SF_DIR, "embeddings"), REPLICATE, 4 * CPUS
        ).localCheckpoint()
        out["vectors"] = emb.count()
        out["kmeans_refined_assign_full"] = timed(
            "kmeans: refine(5) + final assign", spark,
            lambda: simsearch.kmeans_refined_assign(emb).count(),
        )

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
