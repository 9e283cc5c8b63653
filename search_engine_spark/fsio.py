"""Filesystem-agnostic small-file IO through the Hadoop FileSystem API.

The build manifest, corpus stats, and size metrics must work wherever the
index tables live — HDFS, S3A/GCS object stores, or plain local disk —
not only on the driver's local filesystem. (The reference's checkpoint was
a local ``last-url`` file, demo.ts:112-131; the north rule scales that up
to per-partition lineage, which on a real cluster lives next to the index
in object storage.) Every helper resolves the scheme through
``Path.getFileSystem(hadoopConf)``, so ``file:/``, ``hdfs:/``, ``s3a:/``
paths all behave identically — scheme-less paths fall back to
``fs.defaultFS`` exactly like Spark's own readers.

Appends are implemented as read + rewrite-to-temp + rename, because
object stores (and some HDFS configs) do not support O_APPEND. Manifests
are tiny — one JSON line per stage/segment — so the rewrite is
O(manifest), never O(index).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession


def _fs(path: str, spark: Optional[SparkSession] = None):
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "filesystem IO needs an active SparkSession (Hadoop conf)"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def exists(path: str, spark: Optional[SparkSession] = None) -> bool:
    _jvm, fs, jpath = _fs(path, spark)
    return bool(fs.exists(jpath))


def is_dir(path: str, spark: Optional[SparkSession] = None) -> bool:
    _jvm, fs, jpath = _fs(path, spark)
    return bool(fs.exists(jpath)) and bool(
        fs.getFileStatus(jpath).isDirectory()
    )


def mkdirs(path: str, spark: Optional[SparkSession] = None) -> None:
    _jvm, fs, jpath = _fs(path, spark)
    fs.mkdirs(jpath)


def read_text(path: str, spark: Optional[SparkSession] = None) -> str:
    """Read a whole (small) file as UTF-8 text."""
    _jvm, fs, jpath = _fs(path, spark)
    stream = fs.open(jpath)
    try:
        chunks = []
        while True:
            # FSDataInputStream.read() is byte-at-a-time over py4j; use
            # the (byte[]) overload via a Java-side buffer copy instead
            buf = stream.readNBytes(65536)
            if not buf:
                break
            chunks.append(bytes(buf))
        return b"".join(chunks).decode("utf-8")
    finally:
        stream.close()


def write_text(
    path: str, text: str, spark: Optional[SparkSession] = None
) -> None:
    """Atomically replace ``path`` with ``text`` (write temp + rename)."""
    _jvm, fs, jpath = _fs(path, spark)
    tmp = _jvm.org.apache.hadoop.fs.Path(path + ".__tmp__")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(jpath):
        fs.delete(jpath, False)
    fs.rename(tmp, jpath)


def append_line(
    path: str, line: str, spark: Optional[SparkSession] = None
) -> None:
    """Append one line via read + atomic rewrite (object-store safe)."""
    current = read_text(path, spark) if exists(path, spark) else ""
    if current and not current.endswith("\n"):
        current += "\n"
    write_text(path, current + line.rstrip("\n") + "\n", spark)


def dir_bytes(path: str, spark: Optional[SparkSession] = None) -> int:
    """Total bytes under ``path`` (0 if absent) — the `du` the reference
    demo shells out for (demo.ts metrics), via getContentSummary."""
    _jvm, fs, jpath = _fs(path, spark)
    if not fs.exists(jpath):
        return 0
    return int(fs.getContentSummary(jpath).getLength())
