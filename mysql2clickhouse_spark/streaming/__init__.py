from .runner import ReplicationRunner, RunConfig, RunReport  # noqa: F401
from .stream import run_streaming_replication  # noqa: F401
