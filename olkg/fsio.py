"""Filesystem abstraction for driver- and executor-side storage I/O.

Two complementary layers, each reaching shared storage (HDFS / S3 / GCS)
the way its side of the cluster naturally can:

- **Driver side** — :func:`exists` / :func:`mkdirs` / :func:`delete` /
  :func:`listdir` / :func:`rename` / :func:`touch` go through Spark's Hadoop
  ``FileSystem`` (resolved from the path's scheme + the session's Hadoop
  conf), so whatever storage Spark itself can read/write — ``file://``,
  ``hdfs://``, ``s3a://`` with the cluster's connector jars and credentials —
  these helpers can too.  Plain paths resolve to the local FS, unchanged
  behavior for the sandbox.

- **Executor side** — :func:`pa_fs` resolves a ``pyarrow.fs.FileSystem``
  from a URI *inside a task* (no JVM access there), used by the fast path's
  side sink (:mod:`olkg.extract`).  ``s3a://`` is translated to pyarrow's
  ``s3://`` scheme; credentials come from the task environment the way any
  pyarrow S3 access does.

Path joining uses POSIX separators (URIs always do); :func:`pjoin` is
``posixpath.join``, safe for both plain paths and URIs on every deployment
this engine targets.
"""

from __future__ import annotations

import posixpath

pjoin = posixpath.join


# --------------------------------------------------------------------------
# Driver side: Hadoop FileSystem via the active session's JVM
# --------------------------------------------------------------------------

def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark, path: str) -> bool:
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    fs.mkdirs(p)


def delete(spark, path: str, recursive: bool = True) -> None:
    """Delete if present (no error when absent)."""
    fs, p = _hadoop_fs(spark, path)
    if fs.exists(p):
        fs.delete(p, recursive)


def listdir(spark, path: str) -> list[str]:
    """Child NAMES (not full paths) of a directory; [] if absent."""
    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def rename(spark, src: str, dst: str) -> bool:
    fs, p_src = _hadoop_fs(spark, src)
    _, p_dst = _hadoop_fs(spark, dst)
    return bool(fs.rename(p_src, p_dst))


def touch(spark, path: str) -> None:
    """Create an empty file (overwrite allowed) — _SUCCESS-style markers."""
    fs, p = _hadoop_fs(spark, path)
    fs.create(p, True).close()


# --------------------------------------------------------------------------
# Executor side: pyarrow FileSystem from a URI (no JVM available in a task)
# --------------------------------------------------------------------------

def translate_pa_uri(uri_or_path: str) -> str:
    """Hadoop URI spelling → pyarrow spelling (``s3a://`` → ``s3://``);
    everything else passes through (plain paths resolve to the local FS)."""
    if uri_or_path.startswith("s3a://"):
        return "s3://" + uri_or_path[len("s3a://"):]
    return uri_or_path


def pa_fs(uri_or_path: str):
    """(pyarrow.fs.FileSystem, path) for a URI or plain path."""
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(translate_pa_uri(uri_or_path))
