"""Generic Object Model (bigdata-gom analog) tests.

Reference semantics: gpo/IGPO.java (values, link sets both directions,
remove retracts both directions), om/IObjectManager.java (interned
GPOs, evaluate/execute), om/INativeTransaction.java (nested
begin/commit, outermost flush, rollback discards)."""

import pytest

from bigdata_old_spark.gom import ObjectManager
from bigdata_old_spark.model import KIND_LITERAL, Term
from bigdata_old_spark.store import TripleStore

TTL = """
@prefix : <http://example.org/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .

:mike a foaf:Person ; foaf:name "Mike" ; foaf:age 34 ;
      foaf:knows :bryan, :martyn .
:bryan a foaf:Person ; foaf:name "Bryan" ; foaf:knows :mike .
:martyn a foaf:Person ; foaf:name "Martyn" .
"""

EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture()
def om(spark):
    return ObjectManager(TripleStore.from_turtle(spark, TTL))


def test_gpo_values_and_types(om):
    mike = om.get_gpo(EX + "mike")
    name = mike.get_value(FOAF + "name")
    assert name.kind == KIND_LITERAL and name.lex == "Mike"
    age = mike.get_value(FOAF + "age")
    assert age.lex == "34"
    assert mike.is_bound(FOAF + "name")
    assert not mike.is_bound(FOAF + "mbox")
    knows = mike.get_values(FOAF + "knows")
    assert sorted(t.lex for t in knows) == [EX + "bryan", EX + "martyn"]


def test_gpo_interning_and_links(om):
    mike = om.get_gpo(EX + "mike")
    assert om.get_gpo(EX + "mike") is mike
    out = mike.get_links_out(FOAF + "knows")
    assert {g.id for g in out} == {EX + "bryan", EX + "martyn"}
    # links OUT interns the same GPO objects
    assert om.get_gpo(EX + "bryan") in out
    bryan = om.get_gpo(EX + "bryan")
    assert {g.id for g in bryan.get_links_in(FOAF + "knows")} == {EX + "mike"}
    martyn = om.get_gpo(EX + "martyn")
    assert martyn.get_reverse_link_properties() == {FOAF + "knows": 1}
    # all-properties variants
    assert {g.id for g in mike.get_links_out()} >= {EX + "bryan", EX + "martyn"}


def test_gpo_statements(om):
    martyn = om.get_gpo(EX + "martyn")
    stmts = martyn.get_statements()
    assert (EX + "martyn", FOAF + "name", Term.literal("Martyn")) in stmts
    preds = {p for _, p, _ in stmts}
    assert preds == {RDF_TYPE, FOAF + "name"}


def test_materialize_many_batches_one_scan(om):
    got = om.materialize_many([EX + "mike", EX + "bryan"])
    assert set(got) == {EX + "mike", EX + "bryan"}
    assert all(g._materialized for g in got.values())
    assert got[EX + "mike"].get_value(FOAF + "name").lex == "Mike"


def test_mutation_autoflush_outside_tx(om):
    mike = om.get_gpo(EX + "mike")
    mike.set_value(FOAF + "name", "Michael")
    rows = om.evaluate(
        f"SELECT ?n WHERE {{ <{EX}mike> <{FOAF}name> ?n }}"
    ).collect()
    assert [r["n"]["lex"] for r in rows] == ["Michael"]


def test_native_transaction_flushes_on_outermost_commit(om):
    d1 = om.begin_native_transaction()
    d2 = om.begin_native_transaction()
    mike = om.get_gpo(EX + "mike")
    mike.add_value(FOAF + "mbox", "mike@example.org")
    # inner commit: nothing flushed yet
    om.commit_native_transaction(d2)
    q = f"ASK {{ <{EX}mike> <{FOAF}mbox> ?m }}"
    assert om.store.query(q).collect()[0][0] is False
    # the GPO's in-memory view already sees the optimistic edit
    assert mike.get_value(FOAF + "mbox").lex == "mike@example.org"
    om.commit_native_transaction(d1)
    assert om.store.query(q).collect()[0][0] is True


def test_native_transaction_rollback_discards(om):
    om.begin_native_transaction()
    mike = om.get_gpo(EX + "mike")
    mike.add_value(FOAF + "mbox", "mike@example.org")
    om.rollback_native_transaction()
    q = f"ASK {{ <{EX}mike> <{FOAF}mbox> ?m }}"
    assert om.store.query(q).collect()[0][0] is False
    # invalidated: re-materializes without the discarded edit
    assert mike.get_value(FOAF + "mbox") is None


def test_transaction_depth_guards(om):
    with pytest.raises(RuntimeError):
        om.commit_native_transaction()
    d = om.begin_native_transaction()
    with pytest.raises(RuntimeError):
        om.commit_native_transaction(d + 7)
    om.commit_native_transaction(d)


def test_remove_retracts_both_directions(om):
    martyn = om.get_gpo(EX + "martyn")
    martyn.remove()
    # forward gone
    assert om.store.query(
        f"ASK {{ <{EX}martyn> ?p ?o }}").collect()[0][0] is False
    # incoming link gone
    assert om.store.query(
        f"ASK {{ ?s ?p <{EX}martyn> }}").collect()[0][0] is False
    # mike's interned in-memory view dropped the link too
    mike = om.get_gpo(EX + "mike")
    assert EX + "martyn" not in {t.lex for t in mike.get_values(FOAF + "knows")}


def test_execute_update_invalidates(om):
    mike = om.get_gpo(EX + "mike")
    assert mike.get_value(FOAF + "name").lex == "Mike"
    om.execute(
        f'DELETE DATA {{ <{EX}mike> <{FOAF}name> "Mike" }} ; '
        f'INSERT DATA {{ <{EX}mike> <{FOAF}name> "Michael" }}'
    )
    assert mike.get_value(FOAF + "name").lex == "Michael"


def test_gom_rejects_quads_store(spark):
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_trig(spark, """
    @prefix : <http://example.org/> .
    :g1 { :a :p :b . }
    """)
    with pytest.raises(ValueError):
        ObjectManager(st)


def test_bnode_links(spark):
    ttl = """
    @prefix : <http://example.org/> .
    :a :addr [ :city "Springfield" ] .
    """
    om = ObjectManager(TripleStore.from_turtle(spark, ttl))
    a = om.get_gpo(EX + "a")
    addr = a.get_links_out(EX + "addr")
    assert len(addr) == 1 and addr[0].id.startswith("_:")
    assert addr[0].get_value(EX + "city").lex == "Springfield"
    assert {g.id for g in addr[0].get_links_in(EX + "addr")} == {EX + "a"}


# ---------------------------------------------------------------------------
# RemoteObjectManager (NanoSparqlObjectManager analog) — GOM over the
# SPARQL 1.1 Protocol against our own live endpoint
# ---------------------------------------------------------------------------

@pytest.fixture()
def remote_om(spark):
    from bigdata_old_spark.server import serve_background

    store = TripleStore.from_turtle(spark, TTL)
    srv, _ = serve_background(store)
    from bigdata_old_spark.gom import RemoteObjectManager

    om = RemoteObjectManager(f"http://127.0.0.1:{srv.server_address[1]}/sparql")
    yield om, srv
    srv.shutdown()


def test_remote_gpo_reads(remote_om):
    om, _ = remote_om
    mike = om.get_gpo(EX + "mike")
    assert mike.get_value(FOAF + "name").lex == "Mike"
    assert {g.id for g in mike.get_links_out(FOAF + "knows")} == {
        EX + "bryan", EX + "martyn"}
    bryan = om.get_gpo(EX + "bryan")
    assert {g.id for g in bryan.get_links_in(FOAF + "knows")} == {EX + "mike"}
    # one round trip for a working set
    got = om.materialize_many([EX + "mike", EX + "martyn"])
    assert got[EX + "martyn"].get_reverse_link_properties() == {FOAF + "knows": 1}


def test_remote_gpo_mutation_roundtrip(remote_om):
    om, srv = remote_om
    d = om.begin_native_transaction()
    mike = om.get_gpo(EX + "mike")
    mike.set_value(FOAF + "name", "Michael")
    mike.add_value(FOAF + "mbox", "mike@example.org")
    # nothing flushed before the outermost commit
    assert srv.store.query(
        f'ASK {{ <{EX}mike> <{FOAF}name> "Michael" }}').collect()[0][0] is False
    om.commit_native_transaction(d)
    assert srv.store.query(
        f'ASK {{ <{EX}mike> <{FOAF}name> "Michael" }}').collect()[0][0] is True
    assert srv.store.query(
        f'ASK {{ <{EX}mike> <{FOAF}name> "Mike" }}').collect()[0][0] is False
    # a fresh remote OM sees the committed state
    from bigdata_old_spark.gom import RemoteObjectManager

    om2 = RemoteObjectManager(om.endpoint)
    assert om2.get_gpo(EX + "mike").get_value(FOAF + "mbox").lex == "mike@example.org"


def test_remote_evaluate_and_execute(remote_om):
    om, _ = remote_om
    rows = om.evaluate(
        f"SELECT ?n WHERE {{ <{EX}mike> <{FOAF}name> ?n }}")
    assert [r["n"].lex for r in rows] == ["Mike"]
    om.execute(f"INSERT DATA {{ <{EX}x> <{EX}y> 7 }}")
    rows = om.evaluate(f"SELECT ?o WHERE {{ <{EX}x> <{EX}y> ?o }}")
    assert rows[0]["o"].lex == "7"


def test_remote_bnode_mutation_rejected(remote_om):
    om, _ = remote_om
    gpo = om.get_gpo(EX + "mike")
    from bigdata_old_spark.model import Term

    with pytest.raises(ValueError):
        gpo.add_value(EX + "ref", Term.bnode("b1"))
    # the rejection left NO trace: in-memory view unchanged, and the
    # next valid mutation flushes cleanly (no poisoned buffer)
    assert gpo.get_value(EX + "ref") is None
    gpo.add_value(EX + "ref", "clean")
    assert om.evaluate(
        f"SELECT ?o WHERE {{ <{EX}mike> <{EX}ref> ?o }}")[0]["o"].lex == "clean" 


def test_skins_as_class(om):
    from bigdata_old_spark.gom import BasicSkin

    class PersonSkin(BasicSkin):
        def name(self):
            return self.get_string(FOAF + "name")

        def age(self):
            return self.get_int(FOAF + "age")

        def first_friend(self):
            return self.get_gpo(FOAF + "knows")

    mike = om.get_gpo(EX + "mike")
    skin = mike.as_class(PersonSkin)
    assert mike.as_class(PersonSkin) is skin  # interned per class
    assert skin.name() == "Mike" and skin.age() == 34
    assert skin.as_generic() is mike
    friend = skin.first_friend()
    assert friend is om.get_gpo(friend.id)
    skin.set_value(FOAF + "name", "Michael")
    assert om.store.query(
        f'ASK {{ <{EX}mike> <{FOAF}name> "Michael" }}').collect()[0][0] is True
    with pytest.raises(TypeError):
        mike.as_class(dict)


def test_remote_set_value_rejection_leaves_state(remote_om):
    """set_value validates the NEW value before removing the old ones:
    a rejected value (bnode over the wire, tx depth 0) must leave both
    the store and the in-memory view untouched (ADVICE r7)."""
    om, srv = remote_om
    from bigdata_old_spark.model import Term

    mike = om.get_gpo(EX + "mike")
    assert mike.get_value(FOAF + "name").lex == "Mike"
    with pytest.raises(ValueError):
        mike.set_value(FOAF + "name", Term.bnode("b9"))
    # in-memory view untouched
    assert mike.get_value(FOAF + "name").lex == "Mike"
    # store untouched (nothing was flushed as DELETE DATA)
    assert srv.store.query(
        f'ASK {{ <{EX}mike> <{FOAF}name> "Mike" }}').collect()[0][0] is True
