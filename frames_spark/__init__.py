"""frames_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of acowley/Frames, re-expressed Spark-first
and extended with large-scale training-data pipeline operators.

See SURVEY.md for the reference mapping and architecture.
"""

from frames_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
