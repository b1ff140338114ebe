"""Multimodal (media) span handling.

Media spans are opaque references (``media_ref``) standing in for binary
image/audio/video payloads. The Spark-side plumbing — schema, batch
shape, partitioning, arrow-vectorized UDF signatures — is real and
tested; the actual byte decoding is STUBBED (the container has no
image/audio libraries) behind a deterministic fake featurizer.

At 100 TB the binary payloads would live in a ``content: binary`` column
(or object-store refs exactly like ``media_ref``); the mapInPandas batch
shape below is unchanged either way.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "media_ref string, mime string, width int, height int, "
    "feature array<float>"
)


def media_manifest(docs: DataFrame) -> DataFrame:
    """All media spans with a deterministic mime classification (derived
    from the ref hash — stands in for magic-byte sniffing)."""
    spans = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).where(F.col("s.kind") == "media")
    first_hex = F.substring(F.md5(F.col("s.media_ref")), 1, 1)
    mime = (
        F.when(first_hex.isin("0", "1", "2", "3", "4", "5"), "image/jpeg")
        .when(first_hex.isin("6", "7", "8", "9", "a"), "audio/wav")
        .otherwise("video/mp4")
    )
    return spans.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        mime.alias("mime"),
    ).orderBy("doc_id", "media_ref")


def decode_media_bytes(payload: bytes) -> object:
    """Real decode hook — requires imaging/audio libs not present in this
    container. The pipeline routes around it via the deterministic fake
    in fake_featurize()."""
    raise NotImplementedError(
        "binary media decoding requires PIL/ffmpeg; not available in this "
        "environment — use fake_featurize for plumbing tests"
    )


def fake_featurize(media_ref: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: bytes of sha1(media_ref)
    scaled to [0,1). Keeps the batch shape identical to a real encoder."""
    h = hashlib.sha1(media_ref.encode("utf-8")).digest()
    return [b / 256.0 for b in h[:dim]]


def media_features(docs: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-vectorized feature extraction over media spans: explode is
    JVM-side; the UDF sees batches of refs and returns fixed-dim vectors.
    Swap fake_featurize for a real decoder without touching the plan."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def fn(iterator):
        for pdf in iterator:
            feats = [fake_featurize(r, dim) for r in pdf["media_ref"]]
            mimes, widths, heights = [], [], []
            for f in feats:
                mimes.append("image/jpeg" if f[0] < 0.5 else "audio/wav")
                widths.append(int(f[1] * 1024) + 1)
                heights.append(int(f[2] * 1024) + 1)
            out = pdf.copy()
            out["mime"] = mimes
            out["width"] = widths
            out["height"] = heights
            out["feature"] = feats
            yield out

    return refs.mapInPandas(fn, schema=MEDIA_FEATURE_SCHEMA)
