"""Driver-side small-file I/O through the Hadoop FileSystem API.

Sidecar metadata (store flags, IVF centroids) is a handful of bytes —
writing it as a 1-row Spark text job costs a full job and, cold, the
Python-worker daemon startup (~10 s measured inside every bulk load,
r10 stage profile).  These helpers hit the same FileSystem the data
files use (so they work wherever Spark writes: local, HDFS, S3A), with
zero jobs.

Layout compatibility: content lives in ``<dir>/part-00000`` and readers
concatenate every non-underscore file in the directory, so directories
written by the old ``df.coalesce(1).write.text(dir)`` path read back
identically.
"""

from __future__ import annotations


def write_text_dir(spark, dir_path: str, content: str) -> None:
    """Overwrite ``dir_path`` with a single part file holding ``content``."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jdir = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = jdir.getFileSystem(conf)
    # overwrite semantics of write.mode("overwrite"): replace the dir
    if fs.exists(jdir):
        fs.delete(jdir, True)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(dir_path + "/part-00000"), True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text_dir(spark, dir_path: str) -> str:
    """Concatenated content of every data file under ``dir_path``
    (skips _SUCCESS/.crc style entries).  Raises if the dir is absent —
    callers treat that as "no sidecar"."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jdir = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = jdir.getFileSystem(conf)
    chunks = []
    for status in sorted(fs.listStatus(jdir), key=lambda s: s.getPath().getName()):
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        stream = fs.open(status.getPath())
        try:
            chunks.append(jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8"))
        finally:
            stream.close()
    return "".join(chunks)
