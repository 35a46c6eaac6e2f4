"""hedera_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of antoine-tran/Hedera (versioned-document /
revision-history analytics), re-designed Spark-first, plus the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns).

See SURVEY.md for the full operator inventory and architecture.
"""

from hedera_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
