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

TMP_SUFFIX = ".__tmp__"


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
    """True if ``path`` exists — including when only its write-temp
    survives a crashed rewrite (see :func:`write_text`); content is
    recovered on the next :func:`read_text`."""
    _jvm, fs, jpath = _fs(path, spark)
    if fs.exists(jpath):
        return True
    return bool(fs.exists(_jvm.org.apache.hadoop.fs.Path(path + TMP_SUFFIX)))


def is_dir(path: str, spark: Optional[SparkSession] = None) -> bool:
    _jvm, fs, jpath = _fs(path, spark)
    return bool(fs.exists(jpath)) and bool(
        fs.getFileStatus(jpath).isDirectory()
    )


def mkdirs(path: str, spark: Optional[SparkSession] = None) -> None:
    _jvm, fs, jpath = _fs(path, spark)
    fs.mkdirs(jpath)


def read_text(path: str, spark: Optional[SparkSession] = None) -> str:
    """Read a whole (small) file as UTF-8 text.

    Crash recovery: if ``path`` is missing but the write-side temp file
    exists (a writer died between delete and rename in
    :func:`write_text`), the temp is promoted to ``path`` first — so a
    kill anywhere inside the rewrite loses at most nothing: either the
    old content (delete not reached) or the fully-written new content
    (temp present) is recovered."""
    _jvm, fs, jpath = _fs(path, spark)
    if not fs.exists(jpath):
        tmp = _jvm.org.apache.hadoop.fs.Path(path + TMP_SUFFIX)
        if fs.exists(tmp):
            if not fs.rename(tmp, jpath):
                raise IOError(f"recovery rename failed: {tmp} -> {path}")
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
    """Replace ``path`` with ``text`` via write-temp / delete / rename.

    Plain ``FileSystem.rename`` cannot overwrite, so there is a
    delete→rename window; a crash inside it leaves the complete new
    content at ``path + TMP_SUFFIX``, which :func:`read_text` and
    :func:`exists` transparently promote on the next access — no state
    is lost either side of the window. A rename that returns false
    (Hadoop signals failure by boolean, not exception) raises instead of
    silently stranding the temp."""
    _jvm, fs, jpath = _fs(path, spark)
    tmp = _jvm.org.apache.hadoop.fs.Path(path + TMP_SUFFIX)
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(jpath):
        fs.delete(jpath, False)
    if not fs.rename(tmp, jpath):
        raise IOError(f"rename failed: {tmp} -> {path}")


def append_line(
    path: str, line: str, spark: Optional[SparkSession] = None
) -> None:
    """Append one line via read + atomic rewrite (object-store safe)."""
    current = read_text(path, spark) if exists(path, spark) else ""
    if current and not current.endswith("\n"):
        current += "\n"
    write_text(path, current + line.rstrip("\n") + "\n", spark)


def list_dir(path: str, spark: Optional[SparkSession] = None) -> list[str]:
    """Child names directly under ``path`` (empty if absent), sorted."""
    _jvm, fs, jpath = _fs(path, spark)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(jpath)
    )


def delete(
    path: str, recursive: bool = True,
    spark: Optional[SparkSession] = None,
) -> bool:
    """Delete ``path`` (no-op False if absent)."""
    _jvm, fs, jpath = _fs(path, spark)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def rename(
    src: str, dst: str, spark: Optional[SparkSession] = None
) -> None:
    """Rename ``src`` -> ``dst`` (parent dirs created; non-overwriting).
    Hadoop signals failure by boolean — raise instead of stranding."""
    _jvm, fs, jsrc = _fs(src, spark)
    jdst = _jvm.org.apache.hadoop.fs.Path(dst)
    parent = jdst.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    if not fs.rename(jsrc, jdst):
        raise IOError(f"rename failed: {src} -> {dst}")


def dir_bytes(path: str, spark: Optional[SparkSession] = None) -> int:
    """Total bytes under ``path`` (0 if absent) — the `du` the reference
    demo shells out for (demo.ts metrics), via getContentSummary."""
    _jvm, fs, jpath = _fs(path, spark)
    if not fs.exists(jpath):
        return 0
    return int(fs.getContentSummary(jpath).getLength())
