"""fsio sidecar I/O — the driver-side Hadoop-FS replacement for the
1-row Spark text jobs (r10 optimization).  Must round-trip, honor
overwrite semantics, and stay read-compatible with directories the old
``coalesce(1).write.text`` path wrote."""

from __future__ import annotations

import shutil

import pytest

from bigdata_old_spark.fsio import read_text_dir, write_text_dir


@pytest.fixture()
def tdir(tmp_path):
    d = str(tmp_path / "sidecar")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_roundtrip(spark, tdir):
    write_text_dir(spark, tdir, '{"a": 1}')
    assert read_text_dir(spark, tdir) == '{"a": 1}'


def test_overwrite_replaces_dir(spark, tdir):
    write_text_dir(spark, tdir, "old old old")
    write_text_dir(spark, tdir, "new")
    assert read_text_dir(spark, tdir) == "new"


def test_reads_spark_text_layout(spark, tdir):
    # old writers: a Spark text job with _SUCCESS marker and part files
    (spark.createDataFrame([("payload",)], "j string")
     .coalesce(1).write.mode("overwrite").text(tdir))
    assert read_text_dir(spark, tdir).strip() == "payload"


def test_missing_dir_raises(spark, tdir):
    with pytest.raises(Exception):
        read_text_dir(spark, tdir + "/nope")


def test_store_flags_roundtrip(spark, tmp_path):
    from bigdata_old_spark.model import Term
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_rows(spark, [(None, "urn:a", "urn:p", Term.integer(1))])
    st.union_default_graph = True
    path = str(tmp_path / "st")
    st.write_parquet(path, partition_by_predicate=True)
    st2 = TripleStore.from_parquet_partitioned(spark, path)
    assert st2.union_default_graph is True
