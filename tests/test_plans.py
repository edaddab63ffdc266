"""Plan-regression tests: the physical-plan properties EXPLAINS.md
documents must HOLD, not just be prose — scans prune/push down, small
sides broadcast, subject joins use the bucketed layout without a
shuffle, aggregations exchange once on flat keys, and nothing ever
degrades to a cartesian product.  A regression here is a 100×-scale
incident even when sf0.001 results stay correct."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gate(spark):
    import __spark_entry__ as m

    store = m._store(spark, SF_DIR)
    return m, store


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_exchanges(plan: str) -> int:
    # formatted-mode node headers: "(11) Exchange" — BroadcastExchange
    # is a separate node name and deliberately NOT counted
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def test_q01_zero_shuffle_bucketed_join(gate, spark):
    m, _ = gate
    p = plan_text(m.queries()["q01_filter_project"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert shuffle_exchanges(p) == 0, p
    # the filter reaches the Parquet scan
    assert "PushedFilters: [" in p


def test_q03_star_single_agg_exchange(gate, spark):
    m, _ = gate
    p = plan_text(m.queries()["q03_tpch_q1"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    # the star fast path aggregates once; one shuffle for the final
    # group-by (plus none for the bucketed subject grouping)
    assert shuffle_exchanges(p) <= 2, p
    assert "HashAggregate" in p


def test_q12_chain_broadcasts(gate, spark):
    m, _ = gate
    p = plan_text(m.queries()["q12_property_path_fk_chain"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # supplier/nation sides broadcast
    assert shuffle_exchanges(p) <= 1, p  # only the final aggregation


def test_headline_no_cartesian_no_rowpython(gate, spark):
    m, _ = gate
    qs = m.queries()
    import bench

    for name in bench.HEADLINE:
        p = plan_text(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in p, name
        # row-at-a-time Python UDFs never appear in the relational path
        assert "BatchEvalPython" not in p, name


def test_search_no_global_window(gate, spark):
    """bds:search with a rank must compile to distributed top-k
    (TakeOrderedAndProject), not a single-partition global Window."""
    m, store = gate
    df = store.query("""
        SELECT ?lit ?r WHERE {
          ?lit <http://www.bigdata.com/rdf/search#search> "spark query" .
          ?lit <http://www.bigdata.com/rdf/search#rank> ?r .
          ?lit <http://www.bigdata.com/rdf/search#maxRank> "10" .
        }""")
    p = plan_text(df)
    assert "TakeOrderedAndProject" in p, p


def test_lm_bucket_no_unbounded_global_window(gate, spark):
    """lm_bucket (VERDICT r7 #2/#3): the corpus rank must be the banded
    two-pass shape — no ntile, and every Window whose input is the
    unbounded corpus carries a partition spec.  Partitionless windows
    are allowed only over the ≤1024-row band-counts aggregate."""
    from bigdata_old_spark.pipeline.text import lm_bucket

    m, _ = gate
    docs = m._read(spark, SF_DIR, "documents")
    p = plan_text(lm_bucket(docs))
    assert "ntile" not in p, p
    # the per-row rank window partitions by the band (formatted explain
    # prints the partition spec first inside windowspecdefinition)
    assert re.search(r"row_number\(\) windowspecdefinition\(__band", p), p


def test_pipeline_no_unbounded_partitionless_window(gate, spark):
    """Sweep the pipeline gate entries: any partitionless Window in a
    plan must sit above a bounding operator (GlobalLimit/TakeOrdered,
    i.e. top-k) or an Aggregate (band/bucket counts) — never directly
    over the unbounded input scan."""
    m, _ = gate
    qs = m.queries()
    for name, fn in qs.items():
        if not name.startswith("p"):
            continue
        p = plan_text(fn(spark, SF_DIR))
        # the known-bad marker: a global ntile is ALWAYS a partitionless
        # window over the unbounded input (bounded top-k windows compile
        # to row_number over TakeOrderedAndProject instead)
        assert "ntile" not in p, name


def test_quads_layout_graph_partition_pruning(gate, spark):
    """The quads serving layout partitions by (p, g) — a GRAPH <const>
    scan with a bound predicate must prune BOTH partition keys to
    directories (VERDICT r8 #3: the 100 TB quads corpus reads one
    (p, g) directory, not every graph's copy of the predicate)."""
    import __spark_entry__ as m

    st = m._quads_store(spark, SF_DIR)
    df = st.query("""
        SELECT ?s ?o WHERE {
          GRAPH <urn:tpch:graph:nation> { ?s <urn:tpch:p:n_name> ?o }
        }""")
    p = plan_text(df)
    mfilters = re.findall(r"PartitionFilters: \[([^\]]*)\]", p)
    assert any("n_name" in f and "urn:tpch:graph:nation" in f
               for f in mfilters), p
    assert "CartesianProduct" not in p


def test_star_scan_prunes_unused_term_fields(gate, spark):
    """compile_star aggregates PER TERM FIELD (r10): object fields the
    query never touches must vanish from the star scan's ReadSchema —
    the old first(struct(all 8 columns)) pinned every object column
    into the read."""
    m, _ = gate
    p = plan_text(m.queries()["q03_tpch_q1"](spark, SF_DIR))
    scan_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert scan_schemas, p
    # q03 touches num/dbl/dtm/lex/dt/lang/kind via its aggregates and
    # flat group keys, but never a boolean object field
    assert all("o_bool" not in s for s in scan_schemas), p


def test_star_scan_range_pushdown(gate, spark):
    """A top-level FILTER range on a star member pre-filters the star
    scan (RangeBOp analog, r10) — the shipdate bound must appear in a
    scan-side Filter condition, not only after the subject aggregate."""
    m, _ = gate
    p = plan_text(m.queries()["q03_tpch_q1"](spark, SF_DIR))
    assert re.search(r"Condition : [^\n]*l_shipdate[^\n]*o_dtm", p), p


def test_exists_noncertain_single_left_evaluation(gate, spark):
    """The non-certain EXISTS marker path (shared var bound under
    OPTIONAL) must evaluate the left side ONCE (r11: EXISTS projection
    → Catalyst ExistenceJoin/semi rewrite), not as the old semi+anti
    union pair that scanned the left side twice."""
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_turtle(spark, """
        @prefix : <http://ex/> .
        :a :p :v1 . :a :q :w1 .
        :b :p :v2 .
        :c :p :v3 . :c :q :w3 .
        :x :r :w1 .
    """)
    df = st.query("""PREFIX : <http://ex/>
        SELECT ?s WHERE {
          ?s :p ?v .
          OPTIONAL { ?s :q ?w }
          FILTER EXISTS { ?y :r ?w }
        }""")
    # semantics: ?w unbound (b) → EXISTS pattern unconstrained → true;
    # w1 matched → true; w3 unmatched → false
    rows = sorted(r["s"]["lex"] for r in df.collect())
    assert rows == ["http://ex/a", "http://ex/b"], rows
    p = plan_text(df)
    # the double-evaluation signature was a Union of semi+anti branches
    assert "Union" not in p, p


def test_not_exists_subquery_scan_prunes_to_key_fields(gate, spark):
    """The NOT EXISTS subquery side dedups the flat resource key, not
    the 8-field term struct (r10): its scan must read only the graph
    column plus the kind/lex fields the key needs."""
    m, _ = gate
    p = plan_text(m.queries()["q07_not_exists"](spark, SF_DIR))
    scan_schemas = [set(re.findall(r"(\w+):", s))
                    for s in re.findall(r"ReadSchema: struct<([^>]*)>", p)]
    assert any(s <= {"g", "s", "o_kind", "o_lex"} and "o_kind" in s
               for s in scan_schemas), p
