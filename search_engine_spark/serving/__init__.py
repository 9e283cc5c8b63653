"""Serving tier: in-process, JVM-free readers over a Spark-built index."""

from .fleet import FleetReader, make_term_shards  # noqa: F401
from .local import LocalIndexReader  # noqa: F401
