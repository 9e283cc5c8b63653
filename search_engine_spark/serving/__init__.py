"""Serving tier: in-process, JVM-free readers over a Spark-built index."""

from .local import LocalIndexReader  # noqa: F401
