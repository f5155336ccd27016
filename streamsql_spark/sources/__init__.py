"""Source connectors: the Spark source zoo behind the dialect.

The reference consumes any Go channel/connector that yields rows
(streamsql.go Emit + stream sources); the Spark analog is "any
DataFrame" — batch or streaming.  ``read_source`` / ``read_stream_source``
wrap the format zoo (parquet/csv/json/orc/text + streaming file and rate
sources) with the options a large-scale pipeline needs, so a user can
point the engine at files in any of these formats and run the same
dialect SQL.
"""

from .files import read_source, read_stream_source

__all__ = ["read_source", "read_stream_source"]
