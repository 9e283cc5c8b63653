"""Hadoop-FS-backed small-file IO (fsio): the checkpoint/metrics layer
must behave identically for scheme-less and scheme-qualified paths, and
appends must survive pre-existing content (object-store-safe rewrite)."""

import json

import pytest

from search_engine_spark import fsio


def test_roundtrip_and_append(spark, tmp_path):
    p = str(tmp_path / "m" / "manifest.jsonl")
    assert not fsio.exists(p)
    fsio.mkdirs(str(tmp_path / "m"))
    fsio.append_line(p, json.dumps({"stage": "docs", "ok": True}))
    fsio.append_line(p, json.dumps({"stage": "segment", "segment": 0}))
    lines = fsio.read_text(p).splitlines()
    assert [json.loads(x)["stage"] for x in lines] == ["docs", "segment"]
    # overwrite is atomic-rename, not truncate-in-place
    fsio.write_text(p, "x\n")
    assert fsio.read_text(p) == "x\n"


def test_scheme_qualified_paths(spark, tmp_path):
    """file:-prefixed URIs resolve through the same helpers — the shape
    hdfs:/s3a: paths take on a cluster."""
    p = f"file://{tmp_path}/stats.json"
    fsio.write_text(p, '{"n_docs": 3}')
    assert fsio.exists(p)
    assert json.loads(fsio.read_text(p)) == {"n_docs": 3}
    assert fsio.is_dir(f"file://{tmp_path}")
    assert not fsio.is_dir(p)


def test_dir_bytes(spark, tmp_path):
    assert fsio.dir_bytes(str(tmp_path / "absent")) == 0
    fsio.write_text(str(tmp_path / "d" / "a.txt"), "12345")
    fsio.write_text(str(tmp_path / "d" / "b.txt"), "123")
    assert fsio.dir_bytes(str(tmp_path / "d")) == 8


def test_requires_session_context(tmp_path):
    """Helpful error (not an AttributeError) when no session exists —
    only relevant for misuse outside Spark jobs."""
    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        pytest.skip("an active session exists in this test process")
    with pytest.raises(RuntimeError, match="SparkSession"):
        fsio.exists(str(tmp_path))


def test_crash_recovery_promotes_temp(spark, tmp_path):
    """A writer killed between delete and rename leaves only the temp
    file; exists() must still see the path and read_text() must recover
    the fully-written new content."""
    p = str(tmp_path / "m.json")
    fsio.write_text(p, "old")
    # simulate the crash window: dst deleted, completed temp left behind
    fsio.write_text(p + fsio.TMP_SUFFIX, "new-complete")
    from py4j.protocol import Py4JJavaError  # noqa: F401
    _jvm, fs, jpath = fsio._fs(p)
    fs.delete(jpath, False)
    assert fsio.exists(p)
    assert fsio.read_text(p) == "new-complete"
    # recovery promoted the temp: a normal append now works on top of it
    fsio.append_line(p, "x")
    assert fsio.read_text(p) == "new-complete\nx\n"
