"""selma_spark: a PySpark-native HTML sanitize/rewrite/extract engine.

Capabilities mirror gjtorikian/selma (reference at /root/reference):
allowlist sanitization, CSS-rule-driven element rewriting, text-chunk
rewriting with ancestor ignore lists, and content extraction — applied
over tables of interleaved text+media span documents via arrow-vectorized
UDFs (the pure-Python core in this package is the UDF payload; the Spark
pipeline lives in selma_spark.spark)."""

from .rewriter import Element, EndTag, Rewriter, TextChunk, rewrite
from .sanitizer import (
    ALL,
    BASIC,
    DEFAULT,
    RELAXED,
    RESTRICTED,
    RELATIVE,
    Sanitizer,
    deep_merge,
    freeze_config,
)
from .selector import Selector, SelectorError

__all__ = [
    "ALL", "BASIC", "DEFAULT", "RELAXED", "RESTRICTED", "RELATIVE",
    "Element", "EndTag", "Rewriter", "Sanitizer", "Selector",
    "SelectorError", "TextChunk", "deep_merge", "freeze_config", "rewrite",
]

__version__ = "0.1.0"
