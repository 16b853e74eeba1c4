"""piglet_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dbis-ilm/piglet (Pig Latin dialect),
re-expressed Spark-first: DataFrame/Catalyst execution, Structured
Streaming for the streaming dialect, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis)."""

from .engine import PigEngine, run, run_query

__all__ = ["PigEngine", "run", "run_query"]
__version__ = "0.1.0"
