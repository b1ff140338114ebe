"""Shim: golden corpus lives in the package (selma_spark.golden)."""
from selma_spark.golden import CONFIG_NAMES, PROTOCOLS, STRINGS
__all__ = ["CONFIG_NAMES", "PROTOCOLS", "STRINGS"]
