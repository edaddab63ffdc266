"""SIDs / provenance mode (reference STATEMENT_IDENTIFIERS,
AbstractTripleStore.java:743-787; VTE.java:42-54 STATEMENT)."""

import pytest

from bigdata_old_spark.store import TripleStore

P = """
PREFIX : <http://example.org/>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX dc: <http://purl.org/dc/elements/1.1/>
"""

REIFIED = """
@prefix : <http://example.org/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix dc: <http://purl.org/dc/elements/1.1/> .

:alice :worksFor :acme .

_:st1 rdf:type rdf:Statement ;
      rdf:subject :alice ;
      rdf:predicate :worksFor ;
      rdf:object :acme ;
      dc:source :hrDatabase ;
      dc:date "2020-01-01" .

_:st2 rdf:subject :bob ;
      rdf:predicate :worksFor ;
      rdf:object :acme .
_:st2 dc:source :rumor .
"""


@pytest.fixture(scope="module")
def sid_store(spark):
    return TripleStore.from_turtle(spark, REIFIED).to_sids()


def test_bundles_rewritten(sid_store):
    # reification triples are gone; statements about the SID remain
    df = sid_store.query(P + "SELECT ?s WHERE { ?s dc:source :hrDatabase }")
    rows = df.collect()
    assert len(rows) == 1
    sid = rows[0]["s"]["lex"]
    assert sid.startswith("sid:")
    # interchanged reification does NOT assert the reified triple —
    # reference semantics proven by reif/rdr-03a.{ttl,srx} (<<:a3 :b :c>>
    # has a bundle but no assertion; expected results exclude a3).  The
    # bundle's metadata stays queryable via the SID map.
    assert sid_store.query(P + "SELECT * WHERE { :bob :worksFor :acme }").count() == 0
    assert sid_store.query(P + "SELECT * WHERE { :alice :worksFor :acme }").count() == 1


def test_provenance_query_via_virtual_reification(sid_store):
    # who says alice worksFor acme?  (rdf:subject/... answer from the
    # SID map — the virtual reification access path)
    df = sid_store.query(P + """
        SELECT ?src WHERE {
          ?sid rdf:subject :alice ;
               rdf:predicate :worksFor ;
               rdf:object :acme ;
               dc:source ?src .
        }""")
    assert [r["src"]["lex"] for r in df.collect()] == ["http://example.org/hrDatabase"]


def test_sid_deterministic_and_distinct(sid_store):
    df = sid_store.query(P + "SELECT ?sid ?s WHERE { ?sid rdf:subject ?s }")
    got = {r["s"]["lex"]: r["sid"]["lex"] for r in df.collect()}
    assert set(got) == {"http://example.org/alice", "http://example.org/bob"}
    assert got["http://example.org/alice"] != got["http://example.org/bob"]


def test_sid_survives_metadata_join(sid_store):
    # full provenance report: every statement with its sources
    df = sid_store.query(P + """
        SELECT ?s ?o ?src WHERE {
          ?sid rdf:subject ?s ; rdf:object ?o ; dc:source ?src .
        }""")
    got = {(r["s"]["lex"], r["src"]["lex"]) for r in df.collect()}
    assert got == {
        ("http://example.org/alice", "http://example.org/hrDatabase"),
        ("http://example.org/bob", "http://example.org/rumor"),
    }


TERSE = """
@prefix : <http://example.org/> .
@prefix dc: <http://purl.org/dc/elements/1.1/> .

:alice :worksFor :acme .
<<:alice :worksFor :acme>> dc:source :hrDatabase .
<<:carol :worksFor :acme>> dc:source :rumor .
"""


def test_terse_rdr_turtle(spark):
    """Terse RDR in Turtle data: <<s p o>> desugars to a reification
    bundle (unasserted, per reif/rdr-03a), then to_sids + the SPARQL
    <<>> surface round-trip it."""
    st = TripleStore.from_turtle(spark, TERSE).to_sids()
    df = st.query(P + """
        SELECT ?who ?src WHERE { <<?who :worksFor :acme>> dc:source ?src }""")
    got = {(r["who"]["lex"], r["src"]["lex"]) for r in df.collect()}
    # only the ASSERTED statement matches the quoted pattern
    assert got == {("http://example.org/alice", "http://example.org/hrDatabase")}
    # carol's metadata exists on its SID, but the triple is unasserted
    assert st.query(P + "SELECT * WHERE { :carol :worksFor :acme }").count() == 0


def test_sids_retraction_cascade(spark):
    """TestChangeSets.java:415 testSids — removing (A X B) in SIDs mode
    also removes the statements ABOUT its sid ((sid1 Y C), (D Z sid1)),
    and the changeset reports all three as removed."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.changesets import InMemChangeLog

    st = TripleStore.from_turtle(spark, """
        @prefix ns: <http://www.bigdata.com/rdf#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        ns:A ns:X ns:B .
        _:s1 a rdf:Statement ;
             rdf:subject ns:A ; rdf:predicate ns:X ; rdf:object ns:B ;
             ns:Y ns:C .
        ns:D ns:Z _:s1 .
    """).to_sids()
    NS = "http://www.bigdata.com/rdf#"
    assert st.statements.count() == 3  # (A X B), (sid1 Y C), (D Z sid1)

    log = InMemChangeLog()
    st2 = st.update(
        "PREFIX ns: <http://www.bigdata.com/rdf#> DELETE DATA { ns:A ns:X ns:B }",
        change_log=log,
    )
    assert st2.statements.count() == 0  # the cascade took the sid statements
    removed = log.changes[0].removed.collect()
    assert len(removed) == 3
    preds = sorted(r["p"] for r in removed)
    assert preds == [NS + "X", NS + "Y", NS + "Z"]

    # control: removing an unrelated statement does NOT cascade
    log2 = InMemChangeLog()
    st3 = st.update(
        "PREFIX ns: <http://www.bigdata.com/rdf#> DELETE DATA { ns:D ns:Z ns:nonexistent }",
        change_log=log2,
    )
    assert st3.statements.count() == 3
    assert log2.changes[0].removed.count() == 0


def test_clear_graph_cascades_sids(spark):
    """ADVICE r5: CLEAR/DROP on a SID-mode store cascade like DELETE —
    clearing the graph holding (A X B) also removes the statement about
    its sid ((sid1 Y C), in the default graph)."""
    st = TripleStore.from_trig(spark, """
        @prefix ns: <http://www.bigdata.com/rdf#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        ns:g1 { ns:A ns:X ns:B . }
        { _:s1 a rdf:Statement ;
               rdf:subject ns:A ; rdf:predicate ns:X ; rdf:object ns:B ;
               ns:Y ns:C . }
    """).to_sids()
    assert st.statements.count() == 2  # (A X B)@g1, (sid1 Y C)
    st2 = st.update("CLEAR GRAPH <http://www.bigdata.com/rdf#g1>")
    assert st2.statements.count() == 0

    # COPY destination replacement cascades the replaced rows too
    st3 = st.update(
        "COPY <http://www.bigdata.com/rdf#gsrc> TO <http://www.bigdata.com/rdf#g1>"
    )
    assert st3.statements.count() == 0  # g1 replaced (by empty) + sid cascade


def test_move_keeps_provenance_of_surviving_statements(spark):
    """ADVICE r6 (update.py:701): MOVE relocates (A X B) to another
    graph — the statement still exists, its SID (keyed on (s,p,o) only)
    is still valid, so its provenance annotation must SURVIVE.  A
    statement that genuinely disappears in the move (destination
    replacement) still cascades."""
    NS = "http://www.bigdata.com/rdf#"
    st = TripleStore.from_trig(spark, """
        @prefix ns: <http://www.bigdata.com/rdf#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        ns:g1 { ns:A ns:X ns:B . }
        ns:g2 { ns:D ns:W ns:E . }
        { _:s1 a rdf:Statement ;
               rdf:subject ns:A ; rdf:predicate ns:X ; rdf:object ns:B ;
               ns:Y ns:C .
          _:s2 a rdf:Statement ;
               rdf:subject ns:D ; rdf:predicate ns:W ; rdf:object ns:E ;
               ns:Y ns:C2 . }
    """).to_sids()
    assert st.statements.count() == 4  # (A X B)@g1, (D W E)@g2, 2 sid rows

    st2 = st.update(f"MOVE <{NS}g1> TO <{NS}g2>")
    rows = {(r["g"], r["s"], r["p"]) for r in st2.statements.collect()}
    # (A X B) now lives in g2; its provenance annotation survived
    assert (NS + "g2", NS + "A", NS + "X") in rows
    assert any(p == NS + "Y" and s.startswith("sid:") for (_, s, p) in rows)
    # (D W E) was replaced away — it AND its sid annotation are gone
    assert not any(p == NS + "W" for (_, _, p) in rows)
    sid_y_rows = [r for r in st2.statements.collect() if r["p"] == NS + "Y"]
    assert len(sid_y_rows) == 1  # only s1's annotation remains
    assert st2.statements.count() == 2
