"""streamsql_spark — a PySpark-native analytics/stream-processing engine
with the query surface of rulego/streamsql, built Spark-first.

Entry points:
    StreamSQL            — facade mirroring the reference API
    get_spark            — tuned SparkSession builder
    parse / plan         — dialect front-end (StreamSQL SQL → QueryPlan)
    BatchExecutor        — plan → DataFrame
"""

from .api.facade import StreamSQL
from .dialect.parser import parse
from .dialect.planner import plan
from .engine.batch import BatchExecutor
from .session import get_spark, load_tables


def __getattr__(name):
    # lazy: streaming pulls in pandas/pyarrow kernels
    if name == "StreamingExecutor":
        from .streaming.executor import StreamingExecutor
        return StreamingExecutor
    raise AttributeError(name)


__all__ = ["StreamSQL", "StreamingExecutor", "parse", "plan", "BatchExecutor",
           "get_spark", "load_tables"]
__version__ = "0.1.0"
