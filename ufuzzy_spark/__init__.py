"""ufuzzy_spark — PySpark-native near-duplicate detection & clustering.

Generalizes uFuzzy's (leeoniya/uFuzzy) bounded-edit, out-of-order,
typo-tolerant matching semantics (reference: /root/reference/src/uFuzzy.mjs)
from in-memory haystack search to web-scale dedup:

    normalize -> shingle -> MinHash/SimHash -> LSH candidates ->
    bounded-edit pair verification -> connected components -> clusters

All heavy stages are DataFrame ops + Arrow-vectorized pandas UDFs; no
per-row Python in hot paths.
"""

from ufuzzy_spark.config import MatchConfig, PipelineConfig

__all__ = ["MatchConfig", "PipelineConfig"]
__version__ = "0.1.0"
