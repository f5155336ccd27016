from .executor import StreamingExecutor
from .harness import StreamReplay, run_streaming_collect

__all__ = ["StreamingExecutor", "StreamReplay", "run_streaming_collect"]
