"""File-format sources (batch + streaming) for the dialect engine.

Formats resolve to Spark's native readers — columnar formats keep
predicate pushdown and column pruning (parquet/orc), text formats get
schema-on-read.  Streaming uses the file source (exactly-once via
checkpointed file tracking) or the rate source for load generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_BATCH_FORMATS = {"parquet", "orc", "csv", "json", "text", "avro"}


def read_source(spark: SparkSession, path: str, fmt: str = "parquet",
                schema=None, **options) -> DataFrame:
    """Batch source: ``read_source(spark, path, 'csv', header='true')``.

    CSV defaults to header+inferSchema when no schema is given (the
    zero-config path a reference user expects); columnar formats ignore
    those options and keep pushdown/pruning.
    """
    fmt = fmt.lower()
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r} "
                         f"(supported: {sorted(_BATCH_FORMATS)})")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    if fmt == "json":
        options.setdefault("multiLine", "false")
    return reader.options(**options).load(path)


def read_stream_source(spark: SparkSession, path: str | None = None,
                       fmt: str = "parquet", schema=None,
                       **options) -> DataFrame:
    """Streaming source: file formats (schema required — Structured
    Streaming does not infer) or ``fmt='rate'`` for synthetic load.

    ``maxFilesPerTrigger`` caps per-batch intake — the Spark analog of
    the reference's channel-capacity backpressure (stream/strategy.go);
    pass it via options.
    """
    fmt = fmt.lower()
    if fmt == "rate":
        return (spark.readStream.format("rate")
                .options(**options).load())
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported stream format {fmt!r}")
    if schema is None:
        raise ValueError("streaming file sources need an explicit schema "
                         "(Structured Streaming does not infer)")
    return (spark.readStream.format(fmt).schema(schema)
            .options(**options).load(path))
