"""History index (HistoryServiceFactory analog over changesets)."""

from pyspark.sql import functions as F

from bigdata_old_spark.history import HistoryLog
from bigdata_old_spark.store import TripleStore

P = "PREFIX : <http://example.org/> PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
EX = "http://example.org/"


def test_history_log_records_revisions(spark):
    st = TripleStore.from_turtle(
        spark, '@prefix : <http://example.org/> . :a :p :b .'
    )
    h = HistoryLog()
    st = st.update(P + "INSERT DATA { :c :p :d }", change_log=h)          # rev 1
    st = st.update(P + "DELETE DATA { :a :p :b } ; "
                       "INSERT DATA { :e :p :f }", change_log=h)          # rev 2
    assert h.revision == 2

    hist = h.history()
    rows = [(r["revision"], r["action"], r["s"]) for r in hist.collect()]
    assert (1, "INSERTED", EX + "c") in rows
    assert (2, "REMOVED", EX + "a") in rows
    assert (2, "INSERTED", EX + "e") in rows

    # range scan: from inclusive, to exclusive (fromTime/toTime contract)
    only1 = h.scan(from_rev=1, to_rev=2).collect()
    assert {r["revision"] for r in only1} == {1}
    removed = h.scan(action="REMOVED").collect()
    assert [(r["revision"], r["s"]) for r in removed] == [(2, EX + "a")]
    byp = h.scan(p=EX + "p")
    assert byp.count() == 3

    # aborted transactions leave no trace and don't advance the revision
    try:
        st.update("LOAD <file:///nonexistent.nt>", change_log=h)
    except Exception:
        pass
    assert h.revision == 2 and h.history().count() == 3


def test_history_log_empty(spark):
    h = HistoryLog()
    assert h.history() is None and h.scan() is None
