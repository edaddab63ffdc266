"""Driver contract: SPARQL-on-Spark engine vs DuckDB SQL oracle.

Every entry runs a SPARQL query through the bigdata_old_spark engine
over the W3C-direct-mapped triplification of the driver's TPC-H-ish
parquet (FIXTURES.md §6) and unwraps the result to plain columns; the
oracle is the equivalent SQL over the *relational* form.  A match
proves the whole stack: triplifier → parser → algebra → DataFrame
compilation → term semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

PREFIXES = """
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
PREFIX c: <urn:tpch:customer#>
PREFIX n: <urn:tpch:nation#>
PREFIX r: <urn:tpch:region#>
PREFIX s: <urn:tpch:supplier#>
PREFIX p: <urn:tpch:part#>
PREFIX o: <urn:tpch:orders#>
PREFIX l: <urn:tpch:lineitem#>
PREFIX e: <urn:tpch:events#>
PREFIX d: <urn:tpch:documents#>
"""

_STORES: dict = {}


def _store(spark: SparkSession, sf_dir: str):
    """Triplify once per (session, sf_dir) into the bucketed serving
    layout: partitioned by predicate (bound-predicate scans prune to
    single directories — the POS-index analog) AND bucketed+sorted by
    subject into 32 buckets, so every BGP subject join reads co-located
    buckets with no shuffle Exchange.  The files are written once to a
    stable path; any later process re-registers them in its own catalog
    (TripleStore.register_bucketed) — no Hive metastore needed."""
    import os
    import re
    import tempfile

    from bigdata_old_spark.mapping import triplify_dir

    _ensure_pkg(spark)
    from bigdata_old_spark.store import TripleStore

    key = (id(spark), sf_dir)
    if key not in _STORES:
        import hashlib

        # the driver hands us a vanilla session: turn off PySpark's
        # per-op call-site capture (a JVM round-trip per Column op —
        # measured ~65% of plan-build time); also reset the module-level
        # cache in case it was already primed to True
        try:
            spark.conf.set("spark.python.sql.dataFrameDebugging.enabled", "false")
            import pyspark.errors.utils as _peu

            _peu._enable_debugging_cache = False
        except Exception:
            pass

        from bigdata_old_spark import mapping as _mapping_mod
        from bigdata_old_spark import model as _model_mod
        from bigdata_old_spark import store as _store_mod

        # version the store by every module that defines the serving
        # encoding (triplifier + statement schema/flat encodings +
        # store layout) so stale /tmp stores from older code are never
        # reused across processes (VERDICT r4 item 8)
        h = hashlib.md5()
        for mod in (_mapping_mod, _model_mod, _store_mod):
            h.update(open(mod.__file__, "rb").read())
        ver = h.hexdigest()[:8]
        tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
        table = f"bdos_{tag}_{ver}_bk"
        path = f"{tempfile.gettempdir()}/{table}"
        # reuse a completed store across processes (marker = _SUCCESS
        # AND at least one p= partition dir — a racing concurrent
        # builder can leave _SUCCESS over a truncated dir; never trust
        # an empty layout); set BDOS_REBUILD=1 to force re-triplification
        done = (os.path.exists(f"{path}/_SUCCESS")
                and any(e.startswith("p=") for e in os.listdir(path))
                and not os.environ.get("BDOS_REBUILD"))
        if not done:
            if spark.catalog.tableExists(table):
                spark.sql(f"DROP TABLE `{table}`")
            TripleStore(spark, triplify_dir(spark, sf_dir)).write_bucketed(table, 32, path=path)
            # triplified TPC-H data is triples-only: skip the graph probe
            _STORES[key] = TripleStore.from_table(spark, table, has_named_graphs=False)
        else:
            _STORES[key] = TripleStore.from_bucketed(spark, table, path, 32, has_named_graphs=False)
        if os.environ.get("BDOS_CACHE_STATEMENTS"):
            # experimentation-only in-memory columnar cache.  The r6
            # serving-cache decision (VERDICT r5 item 5) was settled by
            # measurement: with the bucketed+predicate-partitioned
            # layout, caching LOSES on every headline query (sf0.1
            # idle-box medians 16.6s cached vs 5.3s uncached; q03
            # 4.70 vs 0.84, q12 2.24 vs 0.43) because InMemoryRelation
            # scans every cached batch instead of pruning p= partition
            # directories and drops the bucket-join zero-Exchange
            # property.  The automatic heuristic is therefore BYPASS;
            # this knob remains only to reproduce the measurement.
            _STORES[key].persist()
    return _STORES[key]


_QSTORES: dict = {}


def _quads_store(spark: SparkSession, sf_dir: str):
    """Quads-mode serving store (VERDICT r6 #6, r8 #3): every
    triplified statement is assigned to its table's named graph
    (urn:tpch:graph:<table>, from the subject IRI's table segment) and
    served from the QUADS-NATIVE layout — bucketed by subject and
    partitioned by (p, g), the Spark analog of the reference's quad key
    orders (SPOKeyOrder quad orders carry the context in every index) —
    so ``GRAPH <const>`` prunes to partition directories exactly like a
    bound predicate.  has_named_graphs=True exercises GRAPH/?g scoping,
    FROM NAMED restriction, and the named-graph scan path end-to-end
    under the driver gate."""
    import hashlib
    import os
    import re as _re
    import tempfile

    from pyspark.sql import functions as F

    from bigdata_old_spark import store as _store_mod
    from bigdata_old_spark.store import TripleStore

    key = (id(spark), sf_dir)
    if key not in _QSTORES:
        ver = hashlib.md5(open(_store_mod.__file__, "rb").read()).hexdigest()[:8]
        tag = _re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
        table = f"bdos_{tag}_{ver}_qk"
        path = f"{tempfile.gettempdir()}/{table}"
        done = (os.path.exists(f"{path}/_SUCCESS")
                and any(e.startswith("p=") for e in os.listdir(path))
                and not os.environ.get("BDOS_REBUILD"))
        if not done:
            st = _store(spark, sf_dir)
            stmts = st.statements.withColumn(
                "g",
                F.concat(
                    F.lit("urn:tpch:graph:"),
                    F.regexp_extract(F.col("s"), "^urn:tpch:([a-z]+):", 1),
                ),
            )
            if spark.catalog.tableExists(table):
                spark.sql(f"DROP TABLE `{table}`")
            TripleStore(spark, stmts).write_bucketed(
                table, 32, path=path, partition_graph=True)
            _QSTORES[key] = TripleStore.from_table(
                spark, table, has_named_graphs=True)
        else:
            _QSTORES[key] = TripleStore.from_bucketed(
                spark, table, path, 32, has_named_graphs=True,
                partition_graph=True)
    return _QSTORES[key]


def _q_quads_graph_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH <const> ⋈ GRAPH ?g under FROM NAMED — customers per nation
    with the graph variable bound by the store (quads path)."""
    from bigdata_old_spark.results import plain

    df = _quads_store(spark, sf_dir).query(PREFIXES + """
        SELECT ?g ?nation (COUNT(?c) AS ?n_cust)
        FROM NAMED <urn:tpch:graph:customer>
        FROM NAMED <urn:tpch:graph:nation>
        WHERE {
          GRAPH <urn:tpch:graph:nation> { ?n n:n_name ?nation }
          GRAPH ?g { ?c c:c_nationkey_ref ?n }
        }
        GROUP BY ?g ?nation""")
    return plain(df, g="str", nation="str", n_cust="long")


def _q_update_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE with USING / USING NAMED dataset scoping, hash-gated
    end-to-end (reference AST2BOpUpdate.java:378-416; VERDICT r7 #1).

    Two mutations on the quads store, then a query over the mutated
    result:
      1. INSERT … USING NAMED region, nation — audits one triple per
         typed subject of the SCOPED graphs only.  If USING NAMED were
         ignored, GRAPH ?g would range over ALL nine graphs and the
         audit count would explode → hash mismatch (discriminating).
      2. INSERT … USING region — default-graph form of the clause.
    """
    from bigdata_old_spark.results import plain

    st = _quads_store(spark, sf_dir)
    st = st.update(PREFIXES + """
        INSERT { GRAPH <urn:tpch:graph:audit> { ?g <urn:tpch:audit#n> ?s } }
        USING NAMED <urn:tpch:graph:region>
        USING NAMED <urn:tpch:graph:nation>
        WHERE { GRAPH ?g { ?s a ?cls } }""")
    st = st.update(PREFIXES + """
        INSERT { GRAPH <urn:tpch:graph:audit2> { ?s <urn:tpch:audit#name> ?o } }
        USING <urn:tpch:graph:region>
        WHERE { ?s <urn:tpch:region#r_name> ?o }""")
    df = st.query(PREFIXES + """
        SELECT ?g (COUNT(*) AS ?n)
        FROM NAMED <urn:tpch:graph:audit>
        FROM NAMED <urn:tpch:graph:audit2>
        WHERE { GRAPH ?g { ?s ?p ?o } }
        GROUP BY ?g""")
    return plain(df, g="str", n="long")


def _sparql(sparql: str, **out_types: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bigdata_old_spark.results import plain

        df = _store(spark, sf_dir).query(PREFIXES + sparql)
        return plain(df, **out_types)

    return run


# ---------------------------------------------------------------------------
# SPARQL queries + SQL oracles (keys must match between the two dicts)
# ---------------------------------------------------------------------------

_SPARQL_QUERIES: dict[str, tuple[str, dict, str]] = {
    # (sparql, plain-output types, oracle sql)
    "q01_filter_project": (
        """SELECT ?c_custkey ?c_acctbal WHERE {
             ?c c:c_custkey ?c_custkey ; c:c_acctbal ?c_acctbal .
             FILTER(?c_acctbal > 9000.0)
           }""",
        dict(c_custkey="long", c_acctbal="double"),
        "SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0",
    ),
    "q02_join_group_count": (
        """SELECT ?n_name (COUNT(?c) AS ?cnt) WHERE {
             ?c c:c_nationkey_ref ?nat . ?nat n:n_name ?n_name
           } GROUP BY ?n_name""",
        dict(n_name="str", cnt="long"),
        """SELECT n_name, count(*) AS cnt
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name""",
    ),
    "q03_tpch_q1": (
        """SELECT ?l_returnflag ?l_linestatus
                  (SUM(xsd:decimal(?qty)) AS ?sum_qty)
                  (SUM(xsd:decimal(?ep)) AS ?sum_base_price)
                  (COUNT(*) AS ?count_order)
           WHERE {
             ?l l:l_returnflag ?l_returnflag ; l:l_linestatus ?l_linestatus ;
                l:l_quantity ?qty ; l:l_extendedprice ?ep ; l:l_shipdate ?sd .
             FILTER(?sd <= "1998-09-02T00:00:00"^^xsd:dateTime)
           } GROUP BY ?l_returnflag ?l_linestatus""",
        dict(l_returnflag="str", l_linestatus="str", sum_qty="decimal2",
             sum_base_price="decimal2", count_order="long"),
        """SELECT l_returnflag, l_linestatus,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
                  count(*) AS count_order
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           GROUP BY l_returnflag, l_linestatus""",
    ),
    "q04_topk": (
        """SELECT ?o_orderkey ?o_totalprice WHERE {
             ?o o:o_orderkey ?o_orderkey ; o:o_totalprice ?o_totalprice
           } ORDER BY DESC(?o_totalprice) ?o_orderkey LIMIT 10""",
        dict(o_orderkey="long", o_totalprice="double"),
        """SELECT o_orderkey, o_totalprice FROM orders
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    ),
    "q05_optional_left_join": (
        """SELECT ?c_custkey ?o_orderkey WHERE {
             ?c c:c_custkey ?c_custkey .
             OPTIONAL { ?ord o:o_custkey_ref ?c ; o:o_orderkey ?o_orderkey }
           }""",
        dict(c_custkey="long", o_orderkey="long"),
        """SELECT c_custkey, o_orderkey
           FROM customer LEFT JOIN orders ON o_custkey = c_custkey""",
    ),
    "q06_union": (
        """SELECT ?name WHERE {
             { ?x c:c_name ?name } UNION { ?x s:s_name ?name }
           }""",
        dict(name="str"),
        "SELECT c_name AS name FROM customer UNION ALL SELECT s_name AS name FROM supplier",
    ),
    "q07_not_exists": (
        """SELECT ?c_custkey WHERE {
             ?c c:c_custkey ?c_custkey .
             FILTER NOT EXISTS { ?o o:o_custkey_ref ?c }
           }""",
        dict(c_custkey="long"),
        """SELECT c_custkey FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    ),
    "q08_minus": (
        """SELECT ?p_partkey WHERE {
             { ?p p:p_partkey ?p_partkey ; p:p_size ?sz . FILTER(?sz < 10) }
             MINUS { ?p p:p_type ?t . FILTER(CONTAINS(?t, "PROMO")) }
           }""",
        dict(p_partkey="long"),
        """SELECT p_partkey FROM part WHERE p_size < 10
           AND p_partkey NOT IN (SELECT p_partkey FROM part WHERE p_type LIKE '%PROMO%')""",
    ),
    "q09_distinct": (
        """SELECT DISTINCT ?seg WHERE { ?c c:c_mktsegment ?seg }""",
        dict(seg="str"),
        "SELECT DISTINCT c_mktsegment AS seg FROM customer",
    ),
    "q10_string_funcs": (
        """SELECT ?c_custkey (UCASE(SUBSTR(?nm, 1, 8)) AS ?up) WHERE {
             ?c c:c_custkey ?c_custkey ; c:c_name ?nm .
             FILTER(STRENDS(?nm, "1"))
           }""",
        dict(c_custkey="long", up="str"),
        """SELECT c_custkey, UPPER(SUBSTRING(c_name, 1, 8)) AS up
           FROM customer WHERE c_name LIKE '%1'""",
    ),
    "q12_property_path_fk_chain": (
        """SELECT ?n_name (COUNT(*) AS ?cnt) WHERE {
             ?l l:l_suppkey_ref/s:s_nationkey_ref/n:n_name ?n_name
           } GROUP BY ?n_name""",
        dict(n_name="str", cnt="long"),
        """SELECT n_name, count(*) AS cnt
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                         JOIN nation ON s_nationkey = n_nationkey
           GROUP BY n_name""",
    ),
    "q13_having": (
        """SELECT ?n_name (COUNT(?c) AS ?cnt) WHERE {
             ?c c:c_nationkey_ref ?nat . ?nat n:n_name ?n_name
           } GROUP BY ?n_name HAVING (COUNT(?c) > 50)""",
        dict(n_name="str", cnt="long"),
        """SELECT n_name, count(*) AS cnt
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name HAVING count(*) > 50""",
    ),
    "q14_agg_min_max": (
        """SELECT ?seg (MIN(?bal) AS ?minb) (MAX(?bal) AS ?maxb) (COUNT(*) AS ?n)
           WHERE { ?c c:c_mktsegment ?seg ; c:c_acctbal ?bal }
           GROUP BY ?seg""",
        dict(seg="str", minb="double", maxb="double", n="long"),
        """SELECT c_mktsegment AS seg, MIN(c_acctbal) AS minb,
                  MAX(c_acctbal) AS maxb, count(*) AS n
           FROM customer GROUP BY c_mktsegment""",
    ),
    "q15_subselect": (
        """SELECT ?n_name ?cnt WHERE {
             ?nat n:n_name ?n_name .
             { SELECT ?nat (COUNT(?s) AS ?cnt) WHERE { ?s s:s_nationkey_ref ?nat } GROUP BY ?nat }
           } ORDER BY DESC(?cnt) ?n_name LIMIT 5""",
        dict(n_name="str", cnt="long"),
        """SELECT n_name, cnt FROM nation
           JOIN (SELECT s_nationkey, count(*) AS cnt FROM supplier GROUP BY s_nationkey) t
             ON n_nationkey = s_nationkey
           ORDER BY cnt DESC, n_name LIMIT 5""",
    ),
    "q16_year_extract": (
        """SELECT ?yr (COUNT(*) AS ?cnt) WHERE {
             ?o o:o_orderdate ?d
           } GROUP BY (YEAR(?d) AS ?yr)""",
        dict(yr="long", cnt="long"),
        """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr, count(*) AS cnt
           FROM orders GROUP BY 1""",
    ),
    "q17_values_in": (
        """SELECT ?o_orderkey ?pri WHERE {
             VALUES ?pri { "1-URGENT" "2-HIGH" }
             ?o o:o_orderkey ?o_orderkey ; o:o_orderpriority ?pri .
           }""",
        dict(o_orderkey="long", pri="str"),
        """SELECT o_orderkey, o_orderpriority AS pri FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""",
    ),
    "q19_group_concat": (
        """SELECT ?r_name (GROUP_CONCAT(?n_name; SEPARATOR="|") AS ?nations)
                  (COUNT(DISTINCT ?n) AS ?n_nations)
           WHERE { ?n n:n_regionkey_ref ?r . ?r r:r_name ?r_name . ?n n:n_name ?n_name }
           GROUP BY ?r_name""",
        dict(r_name="str", nations="str", n_nations="long"),
        """SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations,
                  count(DISTINCT n_nationkey) AS n_nations
           FROM nation JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name""",
    ),
    "q23_regex": (
        """SELECT ?p_partkey ?t WHERE {
             ?p p:p_partkey ?p_partkey ; p:p_type ?t .
             FILTER(REGEX(?t, "^(econ|sm)", "i"))
           }""",
        dict(p_partkey="long", t="str"),
        """SELECT p_partkey, p_type AS t FROM part
           WHERE regexp_matches(p_type, '(?i)^(econ|sm)')""",
    ),
    "q24_minmax_strings": (
        """SELECT (MIN(?nm) AS ?first_name) (MAX(?nm) AS ?last_name)
           WHERE { ?c c:c_name ?nm }""",
        dict(first_name="str", last_name="str"),
        "SELECT MIN(c_name) AS first_name, MAX(c_name) AS last_name FROM customer",
    ),
    "q25_path_star_seeded": (
        """SELECT ?x WHERE {
             <urn:tpch:orders:1> (o:o_custkey_ref|c:c_nationkey_ref|n:n_regionkey_ref)+ ?x
           }""",
        dict(x="str"),
        """SELECT 'urn:tpch:customer:' || o_custkey AS x FROM orders WHERE o_orderkey = 1
           UNION
           SELECT 'urn:tpch:nation:' || c_nationkey FROM orders
             JOIN customer ON c_custkey = o_custkey WHERE o_orderkey = 1
           UNION
           SELECT 'urn:tpch:region:' || n_regionkey FROM orders
             JOIN customer ON c_custkey = o_custkey
             JOIN nation ON n_nationkey = c_nationkey WHERE o_orderkey = 1""",
    ),
    "q26_avg_decimal": (
        """SELECT ?seg (AVG(xsd:decimal(?bal)) AS ?avg_bal)
           WHERE { ?c c:c_mktsegment ?seg ; c:c_acctbal ?bal } GROUP BY ?seg""",
        dict(seg="str", avg_bal="decimal6"),
        """SELECT c_mktsegment AS seg,
                  CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,6)) AS avg_bal
           FROM customer GROUP BY c_mktsegment""",
    ),
    "q18_events_agg": (
        """SELECT ?event_type (COUNT(*) AS ?cnt) (MIN(?v) AS ?minv) (MAX(?v) AS ?maxv)
           WHERE { ?e e:event_type ?event_type ; e:value ?v }
           GROUP BY ?event_type""",
        dict(event_type="str", cnt="long", minv="double", maxv="double"),
        """SELECT event_type, count(*) AS cnt, MIN(value) AS minv, MAX(value) AS maxv
           FROM events GROUP BY event_type""",
    ),
}


# ---------------------------------------------------------------------------
# Other query forms: CONSTRUCT / ASK / GAS analytics
# ---------------------------------------------------------------------------

def _q_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSTRUCT template instantiation, flattened to comparable strings."""
    from pyspark.sql import functions as F

    df = _store(spark, sf_dir).query(PREFIXES + """
        CONSTRUCT { ?c <urn:tpch:viz#inNation> ?n_name }
        WHERE { ?c c:c_nationkey_ref ?nat . ?nat n:n_name ?n_name }""")
    return df.select(
        F.col("s")["lex"].alias("s"),
        F.col("p")["lex"].alias("p"),
        F.col("o")["lex"].alias("o"),
    )


def _q_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE (SymmetricOneStep default) over the triplified store:
    the forward arcs of nation 0 plus every FK arc pointing at it —
    the oracle enumerates the direct-mapping triples in SQL."""
    from pyspark.sql import functions as F

    df = _store(spark, sf_dir).query("DESCRIBE <urn:tpch:nation:0>")
    return df.select(
        F.col("s")["lex"].alias("s"),
        F.col("p")["lex"].alias("p"),
        F.col("o")["lex"].alias("o"),
    )


def _q_ask(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _store(spark, sf_dir).query(PREFIXES + """
        ASK { ?c c:c_acctbal ?b . FILTER(?b > 9000.0) }""")


def _q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS depths over the reversed FK graph from region 0 (GAS parity,
    oracle = DuckDB recursive CTE)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.analytics import bfs

    out = bfs(_fk_edges(spark, sf_dir), "urn:tpch:region:0")
    return out.select(F.col("v"), F.col("depth").cast("long").alias("depth"))


def _fk_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed region→nation→{customer,supplier} FK edges (the q22
    graph), derived from the triplified store's pruned predicate scans."""
    from pyspark.sql import functions as F

    st = _store(spark, sf_dir)
    fwd = st.statements.where(F.col("p").isin(
        "urn:tpch:nation#n_regionkey_ref",
        "urn:tpch:customer#c_nationkey_ref",
        "urn:tpch:supplier#s_nationkey_ref",
    ))
    return fwd.select(F.col("o_lex").alias("src"), F.col("s").alias("dst")).dropDuplicates()


def _q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSSP from region 0 over the FK graph (unit weights = reference
    GAS SSSP v1, SSSP.java:53 — so dist ≡ BFS depth; VERDICT r6 #7
    direct oracle for §2.11 SSSP)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.analytics import sssp

    out = sssp(_fk_edges(spark, sf_dir), "urn:tpch:region:0")
    return out.select(F.col("v"), F.col("dist").cast("long").alias("dist"))


def _q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the undirected FK graph — each region
    is one component labeled by its min vertex IRI (VERDICT r6 #7
    direct oracle for §2.11 CC; min-label parity with CC.java:71)."""
    from bigdata_old_spark.analytics import connected_components

    return connected_components(_fk_edges(spark, sf_dir)).select("v", "component")


def _q_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS closure: declare customer/supplier ⊑ party, count inferred
    party instances per class — oracle = plain relational counts."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.inference import rdfs_closure
    from bigdata_old_spark.model import RDF_TYPE, RDFS, Term, statements_df_from_terms

    st = _store(spark, sf_dir)
    axioms = statements_df_from_terms(
        [
            (None, "urn:tpch:class:customer", RDFS + "subClassOf", Term.iri("urn:tpch:class:party")),
            (None, "urn:tpch:class:supplier", RDFS + "subClassOf", Term.iri("urn:tpch:class:party")),
        ],
        spark,
    )
    closed = rdfs_closure(st.statements.unionByName(axioms))
    return (
        closed.where((F.col("p") == RDF_TYPE) & (F.col("o_lex") == "urn:tpch:class:party"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_party"))
    )


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→nation→region FK graph (rows-only)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.analytics import edges_of, pagerank

    st = _store(spark, sf_dir)
    edges = edges_of(
        st.statements.where(F.col("p").isin(
            "urn:tpch:customer#c_nationkey_ref", "urn:tpch:nation#n_regionkey_ref"
        ))
    )
    pr = pagerank(edges, max_iter=15)
    return pr.select("v", F.round(F.col("rank"), 4).alias("rank")).orderBy(F.desc("rank"), F.asc("v")).limit(30)


def _q_fulltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bds:search over the triplified documents text (rows-only:
    tf·idf relevance is engine-defined)."""
    st = _store(spark, sf_dir)
    df = st.query(PREFIXES + """
        SELECT ?doc ?rank WHERE {
          ?lit <http://www.bigdata.com/rdf/search#search> "spark query join" .
          ?lit <http://www.bigdata.com/rdf/search#rank> ?rank .
          ?lit <http://www.bigdata.com/rdf/search#maxRank> "20" .
          ?doc d:text ?lit .
        }""")
    from bigdata_old_spark.results import plain

    return plain(df, doc="str", rank="long")




# ---------------------------------------------------------------------------
# Pipeline operators (dedup / similarity / text analysis) — DataFrame-native
# ---------------------------------------------------------------------------

_PKG_SHIPPED: set[str] = set()


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship bigdata_old_spark to the Python workers (addPyFile) so
    mapInPandas/applyInPandas closures that reference module-level
    helpers import cleanly even when the DRIVER process found the
    package only via a sys.path insert (e.g. a harness running from a
    different cwd without PYTHONPATH — local-mode workers inherit the
    process env, not the driver's sys.path)."""
    import os
    import shutil
    import tempfile

    app_id = spark.sparkContext.applicationId
    if app_id in _PKG_SHIPPED:
        return
    _PKG_SHIPPED.add(app_id)
    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bigdata_old_spark")
    # Private (0o700), unpredictable directory; always rebuild the archive
    # rather than trusting a pre-existing file at a guessable path — the
    # zip is imported on every executor, so a stale/planted file there
    # would get shipped and executed.
    tmp_dir = tempfile.mkdtemp(prefix="bigdata_old_spark_pyfiles_")
    zip_path = shutil.make_archive(
        os.path.join(tmp_dir, "bigdata_old_spark"), "zip",
        root_dir=os.path.dirname(pkg_dir), base_dir="bigdata_old_spark")
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception as exc:  # only the known duplicate-add case is benign
        if "already" not in str(exc).lower():
            raise


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from bigdata_old_spark.mapping import read_table

    _ensure_pkg(spark)
    return read_table(spark, f"{sf_dir}/{table}.parquet")


def _p_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import exact_duplicates

    docs = _read(spark, sf_dir, "documents")
    return exact_duplicates(docs).select("content_hash", "keep_id", F.col("n_dups").cast("long").alias("n_dups"))


def _p_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.text import token_count

    docs = _read(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        token_count(c).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("long").alias("n_alpha"),
        F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("long").alias("n_digit"),
        F.length(c).cast("long").alias("n_chars_m"),
    )


def _p_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = brute_force_topk(emb, queries_df, k=10)
    return out.select("q_id", "vec_id", F.round(F.col("sim"), 5).alias("sim"), F.col("rnk").cast("long").alias("rnk"))


def _p_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 top-k: the whole corpus int8-quantized on one global grid,
    ranking by the quantized dot product.  The oracle replays the exact
    quantization arithmetic (floor(x*scale+0.5) clamp) in SQL, so the
    grid, the clamping, and the integer ranking are all value-checked."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import quantized_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = quantized_topk(emb, queries_df, k=10)
    return out.select("q_id", "vec_id", "qdot", F.col("rnk").cast("long").alias("rnk"))


def _p_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe == n_centroids: every inverted list is probed, so
    the result provably equals the exact brute-force top-k — the same
    all-pairs oracle as p03 value-checks the whole IVF path (quantizer,
    inverted lists, probe join, re-rank)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_topk(emb, queries_df, k=10, n_centroids=8, nprobe=8)
    return out.select("q_id", "vec_id", F.round(F.col("sim"), 5).alias("sim"), F.col("rnk").cast("long").alias("rnk"))


def _p_ivf_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index ANN serve path (build_ivf_index / ivf_search):
    the corpus's inverted lists are materialized once, then the query
    batch searches the INDEX — no corpus re-assignment.  Full probe
    (nprobe == n_centroids) makes the output provably equal the exact
    brute-force top-k, so the p03 oracle value-checks the whole
    build/serve machinery."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import build_ivf_index, ivf_search

    emb = _read(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, n_centroids=8)
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_search(idx, queries_df, k=10, nprobe=8)
    return out.select("q_id", "vec_id", F.round(F.col("sim"), 5).alias("sim"), F.col("rnk").cast("long").alias("rnk"))


def _p_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-hyperplane LSH ANN at the provably exhaustive
    parameterization (n_planes=0, bands=1 → one bucket, full candidate
    set), so output ≡ exact top-k and the all-pairs DuckDB oracle
    value-checks the whole banding/bucket-join/re-rank path — the same
    trick as p09's nprobe==n_centroids."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = lsh_topk(emb, queries_df, k=10, n_planes=0, bands=1)
    return out.select("q_id", "vec_id", F.round(F.col("sim"), 5).alias("sim"), F.col("rnk").cast("long").alias("rnk"))


def _p_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked + exact verify,
    gate-checked against a DuckDB all-pairs list_cosine_similarity
    filter.  The raw embeddings table has no near-dup pairs (max
    pairwise cosine ≈ 0.51), so every vec_id % 10 == 0 vector gets a
    deterministic perturbed twin (0.98·v + 0.02·next vector, id+100000)
    on BOTH the Spark and DuckDB sides — twin pairs land at cosine
    ≈ 0.9997, far above the blocking recall knee, and the all-pairs
    oracle then value-checks the whole LSH → verify path."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import cosine_near_dup_pairs

    emb = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
    )
    nxt = emb.select((F.col("id") - 1).alias("id"), F.col("v").alias("nv"))
    twins = (
        emb.where(F.col("id") % 10 == 0)
        .join(nxt, "id")
        .select(
            (F.col("id") + 100000).alias("id"),
            F.zip_with("v", "nv", lambda x, y: x * F.lit(0.98) + y * F.lit(0.02)).alias("v"),
        )
    )
    aug = emb.unionByName(twins)
    # radius 5 ≫ the measured max signature distance of any true
    # ≥0.98 pair (2, deterministic under seed 42 at sf0.001/0.01), so
    # the Hamming filter provably drops nothing the all-pairs oracle
    # keeps; bands=6 ≥ radius+1 makes blocking recall pigeonhole-exact.
    out = cosine_near_dup_pairs(
        aug, min_sim=0.98, id_col="id", vec_col="v",
        n_planes=48, hamming_radius=5, bands=6,
    )
    return out.select("id_a", "id_b", F.round(F.col("sim"), 5).alias("sim"))


def _p_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample of the documents corpus —
    md5-keyed so the DuckDB oracle replays the exact selection."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import stratified_sample

    docs = _read(spark, sf_dir, "documents")
    out = stratified_sample(docs, ["lang"], cap=20, id_col="doc_id")
    return out.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))


def _p_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing over the documents table
    (pipeline.packing.concat_chunk_packing): bucket-sharded token
    stream sliced into 512-token training sequences."""
    from bigdata_old_spark.pipeline.packing import concat_chunk_packing

    docs = _read(spark, sf_dir, "documents")
    return concat_chunk_packing(docs, budget=512, n_buckets=8)


def _p_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals over documents
    (pipeline.text.repetition_signals)."""
    from bigdata_old_spark.pipeline.text import repetition_signals

    docs = _read(spark, sf_dir, "documents")
    return repetition_signals(docs)


def _p_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: every doc ranked by
    md5(seed || id); the DuckDB oracle replays the exact permutation
    key and its 64-bit prefix."""
    from bigdata_old_spark.pipeline.sampling import seeded_shuffle

    docs = _read(spark, sf_dir, "documents")
    return seeded_shuffle(docs, seed=42).select(
        "doc_id", "shuffle_rank", "shuffle_rank_64"
    )


def _p_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware leakage-safe split keyed on the lang column: every
    language lands wholly on one side."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import group_hash_split

    docs = _read(spark, sf_dir, "documents")
    train, test = group_hash_split(docs, "lang", test_sixteenths=4)
    return (
        train.select(F.lit("train").alias("side"), "doc_id", "lang")
        .unionByName(test.select(F.lit("test").alias("side"), "doc_id", "lang"))
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.count_distinct("lang").alias("n_groups"),
        )
    )


def _p_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction through the REAL mapInPandas path
    (pipeline.multimodal.extract_image_features — Arrow-batched binary
    content in, sha256 + deterministic fake vision features out).

    Content is built Catalyst-side as ASCII bytes (repeat(md5(id), 4)
    encoded UTF-8) so the DuckDB oracle can replay the exact
    bytes→sha256→feature chain with its VARCHAR-only hash functions;
    the engine still sees an opaque ``binary`` column, exactly the
    schema a real image corpus has.  Features are emitted per-dimension
    as exact byte ints (feature · 255 == digest byte) so the gate
    compares integers, not float32-vs-float64 rounding residue."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.multimodal import extract_image_features

    media = spark.range(64).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        F.encode(F.repeat(F.md5(F.col("id").cast("string")), 4), "UTF-8").alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_image_features(media)
    return feats.select(
        "media_id", "sha256", "n_bytes",
        F.posexplode("feature").alias("pos", "f"),
    ).select(
        "media_id", "sha256", "n_bytes",
        F.col("pos").cast("long").alias("pos"),
        F.round(F.col("f") * 255).cast("long").alias("fbyte"),
    )


def _p_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: 3-gram overlap of every training doc
    against an eval set (here: the doc_id % 20 == 0 slice of the same
    corpus, so planted 100%-contaminated docs exist alongside organic
    partial boilerplate overlap).  Oracle replays the distinct-3-gram
    left-join in DuckDB."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.decontam import ngram_contamination

    docs = _read(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 20 == 0)
    return ngram_contamination(docs, eval_df, n=3, min_frac=0.2)


def _p_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: deterministic e-mail/IP/phone spans are planted
    into a doc_id % 7 == 0 slice (both sides build the identical
    string), then counted and redacted with patterns that behave the
    same under Java regex and RE2 — counts AND the redacted text are
    value-checked."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.redact import pii_signals, redact_pii

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" Contact user"), F.col("doc_id").cast("string"),
                    F.lit("@example.com or 10.0."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit(".1 or +1 555-000-"),
                    (F.col("doc_id") % 10000).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    sig = pii_signals(docs)
    red = redact_pii(docs).select("doc_id", F.col("text").alias("redacted"))
    return sig.join(red, "doc_id")


def _p_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe deterministic train/test split: report per-side
    counts and checksum of ids (split membership is id-hash keyed)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import hash_split

    docs = _read(spark, sf_dir, "documents")
    train, test = hash_split(docs, id_col="doc_id", test_sixteenths=2)
    return (
        train.select(F.lit("train").alias("side"), "doc_id")
        .unionByName(test.select(F.lit("test").alias("side"), "doc_id"))
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )


def _p_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import minhash_lsh_pairs

    docs = _read(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, min_jaccard=0.4).select(
        "id_a", "id_b", F.round(F.col("jaccard"), 5).alias("jaccard")
    )


def _p_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the md5/60-bit token hash so the
    signature math is bit-for-bit reproducible by the DuckDB oracle;
    max_hamming=3 with blocks=4 keeps the pigeonhole recall guarantee,
    so the blocked output equals brute-force Hamming ≤ 3."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import simhash_pairs

    docs = _read(spark, sf_dir, "documents")
    out = simhash_pairs(docs, max_hamming=3, blocks=4, bits=60, token_hash="md5")
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _p_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token windows with 8-token overlap
    over the documents table — per-row array expressions, the DuckDB
    oracle replays the same start arithmetic and slices."""
    from bigdata_old_spark.pipeline.packing import chunk_documents

    docs = _read(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=64, overlap=8)


def _p_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing over a skewed source split
    (60/30/10): alpha=0.5 boosts the small source to its cap and trims
    the big one; the oracle replays the same count/pow/round targets
    and the (md5(id), id) per-source selection order."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import temperature_resample

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 6, "big")
        .when(F.col("doc_id") % 10 < 9, "mid")
        .otherwise("small")
        .alias("src"),
    )
    out = temperature_resample(docs, alpha=0.5, source_col="src")
    return out.select("doc_id", "src")


def _p_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1) — every signal is a
    row-local Catalyst expression; the oracle replays the same regex
    and ratio arithmetic in SQL."""
    from bigdata_old_spark.pipeline.text import gopher_quality

    return gopher_quality(_read(spark, sf_dir, "documents"))


def _p_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level corpus dedup: documents are re-chunked
    into 8-token lines (the synthetic corpus has no newlines), then any
    line occurring in >= 2 distinct documents is dropped everywhere.
    Boilerplate detection is one count-distinct groupBy; the small
    boilerplate set anti-joins back (AQE broadcasts it)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import line_dedup

    docs = _read(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    lined = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(8)),
                lambda s: F.array_join(F.slice(toks, s, 8), " "),
            ),
            "\n",
        ).alias("text"),
    )
    return line_dedup(lined, min_docs=2)


def _p_fuzzy_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (near-duplicate) eval-set contamination pairs: documents
    split into train (doc_id % 7 != 0) and eval (doc_id % 7 = 0); the
    eval side's bucket keys broadcast into the probe join.  The exact
    all-pairs oracle restricted to cross pairs value-checks it (same
    LSH-completeness argument as p04/p21 at j >= 0.4)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.decontam import fuzzy_contamination_pairs

    docs = _read(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 7 != 0)
    ev = docs.where(F.col("doc_id") % 7 == 0)
    out = fuzzy_contamination_pairs(train, ev, min_jaccard=0.4)
    return out.select(
        "id_train", "id_eval", F.round(F.col("jaccard"), 5).alias("jaccard")
    )


def _p_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget data mixing: documents bucketed into
    three synthetic sources (doc_id % 3), sampled to a 60/30/10 token
    mix of a 3000-token budget in stable (md5(id), id) order — the SQL
    oracle replays the same window cumsum."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import token_budget_mix

    docs = _read(spark, sf_dir, "documents").withColumn(
        "source", F.element_at(F.array(F.lit("web"), F.lit("code"), F.lit("books")),
                               (F.col("doc_id") % 3 + 1).cast("int"))
    )
    out = token_budget_mix(
        docs, {"web": 0.6, "code": 0.3, "books": 0.1}, total_tokens=3000
    )
    return out.select("doc_id", "source", "n_tokens")


def _p_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax epochs-capped uniform mixing (Chung et al. 2023): three
    synthetic sources (doc_id % 3), 5000-token budget, ≤2 epochs per
    source — ascending water-filling allocation replayed by the oracle
    as an unrolled 3-step CTE chain (the allocation is driver-side
    model state, like the IVF centroids)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import unimax_mix

    docs = _read(spark, sf_dir, "documents").withColumn(
        "source", F.element_at(F.array(F.lit("web"), F.lit("code"), F.lit("books")),
                               (F.col("doc_id") % 3 + 1).cast("int"))
    )
    out = unimax_mix(docs, total_tokens=5000, max_epochs=2)
    return out.select("doc_id", "source", "n_tokens", "n_epochs")


def _p_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encode through the REAL Arrow-batched mapInPandas path with
    the provably-SQL-expressible n_merges=0 parameterization: zero
    merges ⇒ every word encodes to its characters + '</w>', so the
    oracle replays the token count and the full piece stream (as an
    md5 of the concatenation) in plain SQL — the same
    exhaustive-parameterization trick as the p20 LSH oracle.  The
    trained-merge path is golden-tested in pytest (iterated rewriting
    is not SQL-expressible)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.bpe import bpe_encode

    docs = _read(spark, sf_dir, "documents")
    out = bpe_encode(docs, merges=[])
    return out.select(
        "doc_id",
        "n_bpe_tokens",
        F.md5(F.concat_ws("", F.col("bpe_tokens"))).alias("enc_hash"),
    )


def _p_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the BM25 top-50
    (lexical) fused with the exact-cosine top-50 for query vector 0
    (vector), 1/(60+rank) contributions, absent-from-one-ranking
    handled by construction.  The oracle replays both retrievers and
    the fusion arithmetic."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import brute_force_topk, rrf_fuse
    from bigdata_old_spark.pipeline.text import bm25_rank

    docs = _read(spark, sf_dir, "documents")
    emb = _read(spark, sf_dir, "embeddings")
    lex = bm25_rank(docs, ["spark", "query", "join"], top=50)
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    vec = brute_force_topk(emb, q, k=50).select(
        F.col("vec_id").alias("doc_id"), F.col("rnk").alias("rank")
    )
    out = rrf_fuse([lex.select("doc_id", "rank"), vec], top=20)
    return out.select("doc_id", F.round("rrf_score", 8).alias("rrf_score"), "rank")


def _p_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint pairs (Schleimer et al. 2003 / MOSS):
    char-8-gram 60-bit md5-prefix hashes, window-4 minima, boilerplate
    fingerprints (docfreq > 20) dropped, pairs sharing >= 2 surviving
    fingerprints; the oracle replays grams → hashes → window minima →
    docfreq guard → inverted-index join verbatim."""
    from bigdata_old_spark.pipeline.text import winnowing_pairs

    docs = _read(spark, sf_dir, "documents")
    return winnowing_pairs(docs, k=8, w=4, min_shared=2, max_docfreq=20, fp_hash="md5")


_WINNOW_ORACLE = """
WITH t AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
  FROM documents
), g AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(length(norm) - 8 + 1, 1) + 1),
           i -> ('0x' || substr(md5(substr(norm, i::INT, 8)), 1, 15))::BIGINT
         ) AS hs
  FROM t
), sel AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(hs) - 4 + 1, 1) + 1),
           i -> list_min(hs[i:i+3])
         )) AS fps
  FROM g
), posts0 AS (
  SELECT doc_id, unnest(fps) AS fp FROM sel
), hot AS (
  SELECT fp FROM posts0 GROUP BY fp HAVING count(*) > 20
), posts AS (
  SELECT doc_id, fp FROM posts0 WHERE fp NOT IN (SELECT fp FROM hot)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM posts a JOIN posts b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2"""


def _p_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs (<= 60 Levenshtein edits) over the
    EXPLICIT all-pairs candidate set — the exactness baseline that
    value-checks the thresholded-DP verifier itself (the production
    path blocks candidates with banded LSH first; the length prefilter
    and early-abandon DP are the same either way)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import edit_distance_pairs

    docs = _read(spark, sf_dir, "documents")
    ids_a = docs.select(F.col("doc_id").alias("id_a"))
    ids_b = docs.select(F.col("doc_id").alias("id_b"))
    allp = ids_a.crossJoin(ids_b).where(F.col("id_a") < F.col("id_b"))
    return edit_distance_pairs(docs, pairs=allp, max_distance=60)


def _p_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data-card profile: doc/token/char totals,
    token mean, distinct heuristic languages, length extrema, exact
    duplicate count — one hash aggregation on the source key."""
    from bigdata_old_spark.pipeline.text import corpus_profile

    docs = _read(spark, sf_dir, "documents")
    return corpus_profile(docs, group_col="source")


def _corpus_profile_oracle() -> str:
    """Replays corpus_profile including the lang_id argmax heuristic
    (same fragment as the p06 oracle) grouped by source."""
    stop = "['the','and','of','to','is','in','that','it','with','a']"
    es = "['el','la','de','que','y','los','en','un','por','una']"
    fr = "['le','la','de','et','les','des','est','un','une','dans']"
    de = "['der','die','und','das','ist','ein','nicht','mit','den','von']"
    raw_toks = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"
    g4 = "greatest(h_en, h_es, h_fr, h_de)"
    return f"""
WITH f AS (
  SELECT source, doc_id, text, {raw_toks} AS toks,
         greatest(length(text), 1)::DOUBLE AS total,
         length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))::DOUBLE AS cjk
  FROM documents
), h AS (
  SELECT *,
         len(list_intersect(list_transform(toks, t -> lower(t)), {stop})) AS h_en,
         len(list_intersect(list_transform(toks, t -> lower(t)), {es})) AS h_es,
         len(list_intersect(list_transform(toks, t -> lower(t)), {fr})) AS h_fr,
         len(list_intersect(list_transform(toks, t -> lower(t)), {de})) AS h_de
  FROM f
), l AS (
  SELECT source, doc_id, len(toks)::BIGINT AS nt, length(text)::BIGINT AS nc,
         CASE WHEN cjk / total > 0.25 THEN 'zh'
              WHEN h_en = {g4} THEN 'en'
              WHEN h_es = {g4} THEN 'es'
              WHEN h_fr = {g4} THEN 'fr'
              ELSE 'de' END AS lang_pred,
         md5(text) AS h
  FROM h
)
SELECT source AS "group", count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens,
       round(avg(nt), 5) AS avg_tokens, sum(nc)::BIGINT AS n_chars,
       min(nc) AS min_chars, max(nc) AS max_chars,
       count(DISTINCT lang_pred) AS n_langs,
       count(*) - count(DISTINCT h) AS n_exact_dups
FROM l GROUP BY 1"""


def _p_lm_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing: equal-size
    rank-based split on the (quantized) bigram-LM cross-entropy —
    rank-based rather than percentile-threshold-based so the split is
    an exact integer function of the (entropy, id) order that reruns
    and the SQL oracle reproduce."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.text import lm_bucket

    docs = _read(spark, sf_dir, "documents")
    out = lm_bucket(docs)
    return out.select(
        "doc_id", "n_bigrams",
        F.round("cross_entropy", 5).alias("cross_entropy"), "bucket"
    )


def _p_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document (CCNet-style perplexity
    quality signal), model trained on the same corpus — pure count
    joins, replicated exactly by the DuckDB oracle."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.text import lm_cross_entropy

    docs = _read(spark, sf_dir, "documents")
    out = lm_cross_entropy(docs)
    return out.select(
        "doc_id", "n_bigrams", F.round(F.col("cross_entropy"), 5).alias("cross_entropy")
    )


def _p_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus-scale dedup (dedup.build_dedup_index /
    dedup_against): documents split into an ingested corpus
    (doc_id % 5 != 0) and a new batch (doc_id % 5 = 0); the batch
    dedups against the corpus's persisted signature index — candidate
    generation probes only the (id, band, hash) bucket table, never a
    corpus self-join.  Verified-LSH at (32 hashes, 8 bands) equals the
    exact pair set on this corpus (see _ngram_jaccard_oracle), so the
    exact all-pairs oracle restricted to batch-touching pairs
    value-checks the index machinery."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import build_dedup_index, dedup_against

    docs = _read(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    idx = build_dedup_index(corpus)
    return dedup_against(idx, batch, min_jaccard=0.4).select(
        "id_a", "id_b", F.round(F.col("jaccard"), 5).alias("jaccard")
    )


def _p_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: CC over verified LSH pairs, canonical =
    min id.  Oracle-checkable because the verified LSH pair set equals
    the exact n-gram-Jaccard pair set on this corpus (see
    _ngram_jaccard_oracle) and CC is engine-independent."""
    from bigdata_old_spark.pipeline.dedup import dedup_clusters

    docs = _read(spark, sf_dir, "documents")
    return dedup_clusters(docs, min_jaccard=0.4).select("doc_id", "cluster_id", "is_keep")


def _p_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_old_spark.pipeline.text import top_ngrams

    docs = _read(spark, sf_dir, "documents")
    return top_ngrams(docs, n=3, k=20)


def _p_quality_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: same clusters as p07, keep
    flag on the LONGEST member (token count; ties → min id)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import dedup_clusters
    from bigdata_old_spark.pipeline.text import token_count

    docs = _read(spark, sf_dir, "documents")
    return dedup_clusters(
        docs, min_jaccard=0.4, keep_score=token_count(F.col("text"))
    ).select("doc_id", "cluster_id", "is_keep")


def _p_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level crawl dedup (pipeline.dedup.url_dedup): two URL
    spellings per page id (scheme/case/www/port/query/fragment/slash
    noise) must canonicalize to one key; the min doc_id survives.  The
    oracle replays the full canonicalization regex chain in SQL."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import url_dedup

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("https://WWW.Example.com/p/"),
                     (F.col("doc_id") / F.lit(2)).cast("long").cast("string"),
                     F.lit("/")),
        ).otherwise(
            F.concat(F.lit("HTTP://example.com:80/p/"),
                     (F.col("doc_id") / F.lit(2)).cast("long").cast("string"),
                     F.lit("?utm=1#f")),
        ).alias("url"),
    )
    return url_dedup(urls).select("doc_id", "url")


def _p_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream table (6 h gap),
    closed-form bounds (member min/max), epoch-seconds output."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.streaming import sessionize_batch

    ev = _read(spark, sf_dir, "events")
    out = sessionize_batch(ev, gap_seconds=21600)
    return out.select(
        "user_id",
        F.col("session_start").cast("long").alias("session_start"),
        F.col("session_end").cast("long").alias("session_end"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round("value_sum", 5).alias("value_sum"),
    )


def _p_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline import text as tx

    docs = _read(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(c).cast("long").alias("n_tokens"),
        F.size(tx.bpe_ish_tokens(c)).cast("long").alias("n_tokens_bpe"),
        F.round(tx.quality_score(c), 4).alias("quality"),
        tx.lang_id(c).alias("lang_pred"),
        tx.fingerprint_md5(c).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Generated DuckDB oracles for the signature/score operators.  Each
# replicates the engine's math exactly (same tokenization regexes, same
# hash bits, double arithmetic throughout) so the driver's value-hash
# comparison is meaningful, not rows-only.
# ---------------------------------------------------------------------------

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"


def _ngram_jaccard_oracle() -> str:
    """All-pairs 3-token-shingle Jaccard ≥ 0.4 (dedup.shingles/jaccard).
    Valid as the oracle for the MinHash-LSH gate because verified LSH at
    (32 hashes, 8 bands) has collision probability ≥ 1-2e-4 for the
    j ≥ 0.9 pairs present in the corpus, and xxhash64 is deterministic —
    the LSH output measured equal to the exact pair set at sf0.01."""
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [array_to_string(toks, ' ')] END AS sh
  FROM base
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
              THEN len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh)))
              ELSE 1.0::DOUBLE END AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(j, 5) AS jaccard FROM pairs WHERE j >= 0.4"""


def _simhash_oracle(bits: int = 60, max_hamming: int = 3) -> str:
    """Replicates dedup.simhash with the md5/60-bit token hash: per-bit
    signed vote over token occurrences, sign → bit; brute-force pairs at
    Hamming ≤ max_hamming (equals the engine's blocked output because
    blocks=4 pigeonhole-guarantees recall at ≤ 3)."""
    sig = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM tok
), sig0 AS (
  SELECT doc_id, {sig} AS sig FROM h GROUP BY doc_id
), sigs AS (
  SELECT d.doc_id, COALESCE(s.sig, 0)::BIGINT AS sig
  FROM documents d LEFT JOIN sig0 s USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}"""


def _dedup_clusters_oracle(min_j: float = 0.4) -> str:
    """Connected components over the exact-Jaccard pair graph via a
    recursive reachability CTE (feasible at oracle scale), cluster id =
    min reachable doc id — replicates dedup.dedup_clusters."""
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [array_to_string(toks, ' ')] END AS sh
  FROM base
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
              THEN len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh)))
              ELSE 1.0::DOUBLE END AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
), und AS (
  SELECT a, b FROM pairs WHERE j >= {min_j}
  UNION ALL
  SELECT b, a FROM pairs WHERE j >= {min_j}
), reach(src, v) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.v
)
SELECT src AS doc_id, min(v) AS cluster_id, (src = min(v)) AS is_keep
FROM reach GROUP BY src"""


def _sessionize_oracle(gap_seconds: int = 21600) -> str:
    """Replicates streaming.sessionize_batch: per-user gap break flags,
    cumulative session index, member-bound aggregation."""
    return f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts - lag(ts) OVER w) > {gap_seconds} THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sidx
  FROM o
)
SELECT user_id,
       floor(epoch(min(ts)))::BIGINT AS session_start,
       floor(epoch(max(ts)))::BIGINT AS session_end,
       count(*) AS n_events,
       round(sum(value), 5) AS value_sum
FROM s GROUP BY user_id, sidx"""


def _quality_lang_oracle() -> str:
    """Replicates text.analyze's deterministic columns: whitespace and
    BPE-ish token counts, the C4/Gopher-style quality score, the
    function-word-argmax language heuristic, md5 fingerprint."""
    stop = "['the','and','of','to','is','in','that','it','with','a']"
    es = "['el','la','de','que','y','los','en','un','por','una']"
    fr = "['le','la','de','et','les','des','est','un','une','dans']"
    de = "['der','die','und','das','ist','ein','nicht','mit','den','von']"
    raw_toks = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"
    bpe = r"'[A-Za-z]{1,6}|\d{1,3}|[^\sA-Za-z\d]'"
    g4 = "greatest(h_en, h_es, h_fr, h_de)"
    return f"""
WITH f AS (
  SELECT doc_id, text, {raw_toks} AS toks,
         greatest(length(text), 1)::DOUBLE AS total,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digit,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE AS punct,
         length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))::DOUBLE AS cjk
  FROM documents
), g AS (
  SELECT *, len(toks) AS n_tok,
         list_transform(toks, t -> lower(t)) AS toks_l,
         length(text)::DOUBLE / greatest(len(toks), 1) AS mwl
  FROM f
), h AS (
  SELECT *,
         len(list_intersect(toks_l, {stop})) AS h_en,
         len(list_intersect(toks_l, {es})) AS h_es,
         len(list_intersect(toks_l, {fr})) AS h_fr,
         len(list_intersect(toks_l, {de})) AS h_de
  FROM g
)
SELECT doc_id,
       n_tok::BIGINT AS n_tokens,
       len(regexp_extract_all(text, {bpe}))::BIGINT AS n_tokens_bpe,
       round(greatest(least(
           (CASE WHEN n_tok >= 10 THEN 0.3::DOUBLE ELSE n_tok * 0.03::DOUBLE END)
         + least(alpha / total * 0.4::DOUBLE, 0.4::DOUBLE)
         + (CASE WHEN h_en > 0 THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END)
         + (CASE WHEN mwl >= 3 AND mwl <= 12 THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END)
         - least(punct / total * 0.5::DOUBLE, 0.25::DOUBLE)
         - least(digit / total * 0.3::DOUBLE, 0.15::DOUBLE)
       , 1.0::DOUBLE), 0.0::DOUBLE), 4) AS quality,
       CASE WHEN cjk / total > 0.25 THEN 'zh'
            WHEN h_en = {g4} THEN 'en'
            WHEN h_es = {g4} THEN 'es'
            WHEN h_fr = {g4} THEN 'fr'
            ELSE 'de' END AS lang_pred,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
FROM h"""


# Every (table, subject, string column) the triplifier turns into an
# xsd:string literal — i.e. the exact corpus build_text_index indexes.
# Lineitem has no unique PK (FIXTURES.md); its oracle subject only needs
# uniqueness (full rows are unique), never appears in output.
_TEXT_CORPUS: list[tuple[str, str, list[str]]] = [
    ("region", "'urn:tpch:region:' || r_regionkey", ["r_name"]),
    ("nation", "'urn:tpch:nation:' || n_nationkey", ["n_name"]),
    ("customer", "'urn:tpch:customer:' || c_custkey", ["c_name", "c_mktsegment"]),
    ("supplier", "'urn:tpch:supplier:' || s_suppkey", ["s_name"]),
    ("part", "'urn:tpch:part:' || p_partkey", ["p_name", "p_brand", "p_type"]),
    ("orders", "'urn:tpch:orders:' || o_orderkey", ["o_orderstatus", "o_orderpriority"]),
    ("lineitem",
     "concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,"
     " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)",
     ["l_returnflag", "l_linestatus"]),
    ("events", "'urn:tpch:events:' || event_id", ["event_type", "props"]),
    ("documents", "'urn:tpch:documents:' || doc_id", ["text", "lang", "source"]),
]


def _fulltext_oracle(query_tokens: list[str], max_rank: int = 20) -> str:
    """Replicates the whole bds:search path over the triplified store:
    the corpus is EVERY xsd:string literal (all string columns of all
    tables), tokenized with the engine's regex; relevance is the
    reference's local-weight cosine (FullTextIndex.java:892): each
    literal's tf vector L2-normalized, quantized through the Lucene
    8-bit norm round-trip (floor(4m)/4 * 2^e -- search.lucene_norm),
    the query vector L2-normalized, relevance = sum of qw*w over
    matched tokens; occurrence -> distinct literal collapse, rank by
    (relevance DESC, literal ASC) top-k, then the ?doc d:text ?lit
    join back to document subjects."""
    branches = "\n  UNION ALL ".join(
        f"SELECT {subj} AS s, 'urn:tpch:{t}#{c}' AS p, {c} AS o_lex "
        f"FROM {t} WHERE {c} IS NOT NULL AND regexp_matches({c}, '[\\pL\\pN]')"
        for t, subj, cols in _TEXT_CORPUS for c in cols
    )
    toks = ", ".join(f"'{t}'" for t in query_tokens)
    qn = len(set(query_tokens))
    return f"""
WITH corpus AS (
  {branches}
), tok AS (
  SELECT s, p, o_lex,
         unnest(list_filter(regexp_split_to_array(lower(o_lex), '[^\\pL\\pN]+'), x -> x <> '')) AS token
  FROM corpus
), idx AS (
  SELECT s, p, o_lex, token, count(*) AS tf FROM tok GROUP BY ALL
), wgt AS (
  SELECT s, p, o_lex, token,
         tf / sqrt(sum(tf * tf) OVER (PARTITION BY s, p, o_lex)) AS wraw
  FROM idx
), hits AS (
  SELECT s, p, o_lex,
         floor(wraw / power(2.0, floor(log2(wraw))) * 4) / 4
           * power(2.0, floor(log2(wraw))) AS w
  FROM wgt WHERE token IN ({toks})
), scored AS (
  SELECT s, p, o_lex, SUM((1.0 / sqrt({qn})) * w) AS relevance
  FROM hits GROUP BY s, p, o_lex
), lit AS (
  SELECT o_lex, max(relevance) AS relevance FROM scored GROUP BY o_lex
), rk AS (
  SELECT o_lex,
         row_number() OVER (ORDER BY round(relevance, 12) DESC, o_lex ASC) AS r
  FROM lit QUALIFY r <= {max_rank}
)
SELECT 'urn:tpch:documents:' || doc_id AS doc, r::BIGINT AS "rank"
FROM rk JOIN documents ON documents.text = rk.o_lex"""


def _pagerank_oracle() -> str:
    """Closed-form fixpoint of analytics.pagerank on the
    customer→nation→region FK DAG: in-degree-0 customers pin at the
    teleport constant after iteration 1, nations after 2, regions after
    3 — so 15 synchronous iterations equal the stationary values.
    Teleport is the engine's Python double 1-0.85 = 0.15000000000000002;
    everything stays DOUBLE to mirror Spark arithmetic."""
    t = repr(1 - 0.85)  # 0.15000000000000002
    return f"""
WITH cn AS (
  SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1
), nr AS (
  SELECT n_nationkey, n_regionkey,
         {t}::DOUBLE + 0.85::DOUBLE * ({t}::DOUBLE * COALESCE(n_cust, 0)) AS r
  FROM nation LEFT JOIN cn ON nk = n_nationkey
), rr AS (
  SELECT n_regionkey, {t}::DOUBLE + 0.85::DOUBLE * SUM(r) AS r FROM nr GROUP BY 1
), allv AS (
  SELECT 'urn:tpch:customer:' || c_custkey AS v, {t}::DOUBLE AS r FROM customer
  UNION ALL SELECT 'urn:tpch:nation:' || n_nationkey, r FROM nr
  UNION ALL SELECT 'urn:tpch:region:' || n_regionkey, r FROM rr
)
SELECT v, round(r, 4) AS "rank" FROM allv ORDER BY round(r, 4) DESC, v LIMIT 30"""


def _p_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-set (Abbas et al. 2023): k-means-clustered
    embedding cosine dedup.  Same deterministic perturbed-twin
    augmentation as p10 (the raw table has no near-dup pairs), and the
    provably-exhaustive n_clusters=1 parameterization — one cluster
    makes the cluster-confined self-join the all-pairs join, so the
    DuckDB NOT EXISTS oracle value-checks the whole
    cluster→pairs→min-id-keep machinery.  Production recall of the
    clustered path is pytest-gated
    (test_semantic_dedup_clustered_recall)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.similarity import semantic_dedup

    emb = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
    )
    nxt = emb.select((F.col("id") - 1).alias("id"), F.col("v").alias("nv"))
    twins = (
        emb.where(F.col("id") % 10 == 0)
        .join(nxt, "id")
        .select(
            (F.col("id") + 100000).alias("id"),
            F.zip_with("v", "nv", lambda x, y: x * F.lit(0.98) + y * F.lit(0.02)).alias("v"),
        )
    )
    aug = emb.unionByName(twins)
    kept = semantic_dedup(aug, n_clusters=1, threshold=0.98, id_col="id", vec_col="v")
    return kept.select("id")


def _p_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) over the documents
    corpus re-chunked into 8-token lines (same synthetic-line recipe as
    p27); chunks starting at token s with s % 16 == 1 get a terminal
    '.' so the terminal-punctuation line rule discriminates.  Line
    rules drop short / unpunctuated lines, then doc rules (>= 3
    sentences over the retained text) drop whole documents."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.text import c4_clean

    docs = _read(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    lined = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(8)),
                lambda s: F.concat(
                    F.array_join(F.slice(toks, s, 8), " "),
                    F.when(s % 16 == 1, F.lit(".")).otherwise(F.lit("")),
                ),
            ),
            "\n",
        ).alias("text"),
    )
    return c4_clean(lined, min_line_words=5, min_sentences=3)


def _p_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment (Broder's |A∩B|/|A|): every
    doc_id % 10 == 0 document gets a synthetic superset twin
    (id+100000, its text concatenated with the next doc's), so real
    embedded-document pairs exist for the inverted-index containment
    join to find; the DuckDB all-ordered-pairs oracle value-checks it
    exactly (the operator is exact — no blocking to parameterize
    away)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import containment_pairs

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("nt"))
    twins = (
        docs.where(F.col("doc_id") % 10 == 0)
        .join(nxt, "doc_id")
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat_ws(" ", "text", "nt").alias("text"),
        )
    )
    aug = docs.unionByName(twins)
    out = containment_pairs(aug, min_containment=0.9)
    return out.select(
        "id_a", "id_b", F.round(F.col("containment"), 5).alias("containment")
    )


def _p_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed-unigram
    bag-of-words log-likelihood ratio of every document against a
    deterministic target slice (doc_id % 11 == 0 — 'the high-quality
    sample').  md5-prefix feature hashing keeps Spark and the DuckDB
    oracle on the same 256 buckets."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import dsir_logratio

    docs = _read(spark, sf_dir, "documents")
    target = docs.where(F.col("doc_id") % 11 == 0)
    out = dsir_logratio(docs, target)
    return out.select("doc_id", F.round(F.col("dsir_logratio"), 5).alias("dsir_logratio"))


def _p_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-SPAN statistics (Lee et al. 2021 ExactSubstr
    dedup re-expressed as rolling 8-token window hashing): a token
    position counts as duplicated iff some 8-token window covering it
    occurs >= 2 times corpus-wide.  md5 window keys keep the oracle on
    the same hash."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import duplicate_spans

    docs = _read(spark, sf_dir, "documents")
    return duplicate_spans(docs, k=8, window_hash="md5").select(
        "doc_id", "n_tokens", "n_dup_tokens", F.round("dup_frac", 5).alias("dup_frac")
    )


def _p_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-n-gram logistic-regression quality classifier (the
    fastText-style GPT-3/CCNet filter): positives = doc_id % 11 == 0
    (the 'reference corpus' slice), negatives = the rest; ONE full-batch
    GD step from zero init — with w0=0 the gradient is a closed-form
    aggregate (sigmoid(0)=1/2), so the SQL oracle replays training AND
    scoring exactly.  More iterations just repeat the verified unit."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.text import classifier_score, train_ngram_classifier

    docs = _read(spark, sf_dir, "documents")
    pos = docs.where(F.col("doc_id") % 11 == 0)
    neg = docs.where(F.col("doc_id") % 11 != 0)
    model = train_ngram_classifier(pos, neg, iters=1, lr=1.0)
    return classifier_score(docs, model).select(
        "doc_id", F.round("quality_prob", 5).alias("quality_prob")
    )


def _p_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a bag-of-tokens query (Lucene idf variant,
    k1=1.2 b=0.75) — posting rows materialize only for query tokens,
    df/avgdl ride as broadcast scalars, top-k is
    TakeOrderedAndProject."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.text import bm25_rank

    docs = _read(spark, sf_dir, "documents")
    return bm25_rank(docs, ["spark", "query", "join"], top=20).select(
        "doc_id", F.round("score", 5).alias("score"), "rank"
    )


def _p_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel over the events table:
    greedy earliest completion, each step strictly after the previous
    — one shuffle on the user key, then a row-local fold over the
    time-sorted event array."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.streaming import funnel_stages

    ev = _read(spark, sf_dir, "events")
    return funnel_stages(ev, ["view", "click", "purchase"]).select(
        "user_id", "stage", F.col("stage_ts").cast("long").alias("stage_ts")
    )


def _q_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP (analytics.weighted_sssp — the link-weight
    generalization of the reference's unit-weight GAS SSSP) over a
    two-layer lineitem graph: source order → its parts (weight =
    l_linenumber) → every supplier shipping that part (weight =
    (partkey+suppkey)%7+1).  Parallel edges and competing paths make
    the min-relaxation non-trivial; the oracle replays the layered
    mins."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.analytics import weighted_sssp

    li = _read(spark, sf_dir, "lineitem")
    src_key = li.agg(F.min("l_orderkey")).collect()[0][0]
    e1 = li.where(F.col("l_orderkey") == src_key).select(
        F.concat(F.lit("O:"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("P:"), F.col("l_partkey")).alias("dst"),
        F.col("l_linenumber").cast("double").alias("weight"),
    )
    e2 = li.select(
        F.concat(F.lit("P:"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("S:"), F.col("l_suppkey")).alias("dst"),
        ((F.col("l_partkey") + F.col("l_suppkey")) % 7 + 1).cast("double").alias("weight"),
    )
    out = weighted_sssp(e1.unionByName(e2), f"O:{src_key}")
    return out.select("v", F.round("dist", 5).alias("dist"))


def _sameas_clique_statements(spark: SparkSession, sf_dir: str):
    """owl:sameAs star cliques from the TPC-H dims: every nation is
    declared sameAs its region, so each region forms one clique of
    region ∪ its nations (driver-side rows: 25 + 5 dims are fixed)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.inference import OWL_SAMEAS
    from bigdata_old_spark.model import Term, statements_df_from_terms

    nation = _read(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    region = _read(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rows = (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select("n_name", "r_name").collect()
    )
    quads = [
        (None, f"urn:tpch:nation:{r['n_name']}", OWL_SAMEAS,
         Term.iri(f"urn:tpch:region:{r['r_name']}"))
        for r in rows
    ]
    return statements_df_from_terms(quads, spark)


def _q_sameas_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative sameAs closure (inference.rdfs_closure
    sameas='canonical'; reference motivation inf/BackchainAccessPath.java):
    the stored mapping is the LINEAR member↔canonical pair set, gated
    exactly against a SQL min-per-clique replay."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.inference import OWL_SAMEAS, rdfs_closure

    closed = rdfs_closure(_sameas_clique_statements(spark, sf_dir),
                          sameas="canonical")
    return (
        closed.where(F.col("p") == OWL_SAMEAS)
        .select(F.col("s"), F.col("o_lex").alias("o"))
    )


def _q_sameas_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expand_sameas over the canonical closure — the O(clique²) FINAL
    materialization must equal the full ordered-pair set per clique."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.inference import OWL_SAMEAS, expand_sameas, rdfs_closure

    closed = rdfs_closure(_sameas_clique_statements(spark, sf_dir),
                          sameas="canonical")
    return (
        expand_sameas(closed).where(F.col("p") == OWL_SAMEAS)
        .select(F.col("s"), F.col("o_lex").alias("o"))
    )


def _sameas_backchain_store(spark: SparkSession, sf_dir: str):
    """Canonical-mode TripleStore over the TPC-H sameAs cliques plus one
    data triple per nation (urn:tpch:p:key → n_nationkey), closed with
    sameas='canonical' — the fixture for the query-transparent
    backchain entries (reference inf/BackchainAccessPath.java)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.model import Term, statements_df_from_terms
    from bigdata_old_spark.store import TripleStore

    sa = _sameas_clique_statements(spark, sf_dir)
    nation = _read(spark, sf_dir, "nation").select("n_name", "n_nationkey").collect()
    data = statements_df_from_terms(
        [(None, f"urn:tpch:nation:{r['n_name']}", "urn:tpch:p:key",
          Term.integer(int(r["n_nationkey"]))) for r in nation],
        spark,
    )
    return TripleStore(spark, sa.unionByName(data)).closure(sameas="canonical")


def _q_sameas_backchain_const(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias IRI constant against a canonical store: urn:tpch:region:*
    is a NON-canonical clique member (the canon is the lexically-min
    nation urn), so the constant only matches through the compile-side
    canonicalization — returns every nationkey of the AMERICA clique."""
    from pyspark.sql import functions as F

    st = _sameas_backchain_store(spark, sf_dir)
    df = st.query(
        "SELECT ?k WHERE { <urn:tpch:region:AMERICA> <urn:tpch:p:key> ?k }")
    return df.select(F.col("k")["num"].cast("bigint").alias("k"))


def _q_sameas_backchain_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable subject over a canonical store: each canonical-space row
    fans back out to every clique member (the iterator half of the
    backchain), exactly the materialized replication."""
    from pyspark.sql import functions as F

    st = _sameas_backchain_store(spark, sf_dir)
    df = st.query("SELECT ?x ?k WHERE { ?x <urn:tpch:p:key> ?k }")
    return df.select(
        F.col("x")["lex"].alias("x"),
        F.col("k")["num"].cast("bigint").alias("k"))


def _q_sameas_canonical_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical sameAs × QUADS composition (VERDICT r9 #5): the data
    triples live in per-region NAMED graphs, the sameAs cliques in the
    default graph.  An alias constant inside GRAPH ?g must canonicalize
    and match, ?g must bind the GRAPH NAME (graphs are never renamed or
    expanded), and the per-graph rows must fan back out exactly like
    the graph-local materialized replication (sameAs2/3 carry g)."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.model import Term, statements_df_from_terms
    from bigdata_old_spark.store import TripleStore

    sa = _sameas_clique_statements(spark, sf_dir)
    rows = (
        _read(spark, sf_dir, "nation")
        .join(_read(spark, sf_dir, "region"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_name", "r_name", "n_nationkey").collect()
    )
    data = statements_df_from_terms(
        [(f"urn:tpch:g:{r['r_name']}", f"urn:tpch:nation:{r['n_name']}",
          "urn:tpch:p:key", Term.integer(int(r["n_nationkey"])))
         for r in rows],
        spark,
    )
    st = TripleStore(spark, sa.unionByName(data)).closure(sameas="canonical")
    df = st.query(
        "SELECT ?g ?k WHERE { GRAPH ?g { "
        "<urn:tpch:region:AMERICA> <urn:tpch:p:key> ?k } }")
    return df.select(
        F.col("g")["lex"].alias("g"),
        F.col("k")["num"].cast("bigint").alias("k"))


_SAMEAS_MEM_SQL = """mem AS (
             SELECT r_regionkey AS cid, 'urn:tpch:region:' || r_name AS t
             FROM region
             UNION ALL
             SELECT n_regionkey, 'urn:tpch:nation:' || n_name FROM nation
           )"""


_FORM_QUERIES: dict[str, tuple] = {
    "q36_sameas_canonical": (
        _q_sameas_canonical,
        f"""WITH {_SAMEAS_MEM_SQL},
           canon AS (SELECT cid, min(t) AS c FROM mem GROUP BY cid),
           pairs AS (SELECT m.t AS s, c.c AS o FROM mem m
                     JOIN canon c USING (cid) WHERE m.t <> c.c)
           SELECT s, o FROM pairs UNION ALL SELECT o AS s, s AS o FROM pairs""",
    ),
    "q37_sameas_expand": (
        _q_sameas_expand,
        f"""WITH {_SAMEAS_MEM_SQL}
           SELECT a.t AS s, b.t AS o
           FROM mem a JOIN mem b ON a.cid = b.cid AND a.t <> b.t""",
    ),
    "q38_sameas_backchain_const": (
        _q_sameas_backchain_const,
        """SELECT n_nationkey AS k
           FROM nation JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'AMERICA'""",
    ),
    "q39_sameas_backchain_var": (
        _q_sameas_backchain_var,
        f"""WITH {_SAMEAS_MEM_SQL}
           SELECT m.t AS x, d.n_nationkey AS k
           FROM nation d JOIN mem m ON d.n_regionkey = m.cid""",
    ),
    "q40_sameas_canonical_quads": (
        _q_sameas_canonical_quads,
        """SELECT 'urn:tpch:g:' || r_name AS g, n_nationkey AS k
           FROM nation JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'AMERICA'""",
    ),
    "q34_weighted_sssp": (
        _q_weighted_sssp,
        """WITH src AS (SELECT min(l_orderkey) AS k FROM lineitem),
           e1 AS (SELECT 'O:' || l_orderkey AS src, 'P:' || l_partkey AS dst,
                         l_linenumber::DOUBLE AS w
                  FROM lineitem WHERE l_orderkey = (SELECT k FROM src)),
           e2 AS (SELECT 'P:' || l_partkey AS src, 'S:' || l_suppkey AS dst,
                         ((l_partkey + l_suppkey) % 7 + 1)::DOUBLE AS w FROM lineitem),
           dp AS (SELECT dst AS v, min(w) AS d FROM e1 GROUP BY 1),
           ds AS (SELECT e2.dst AS v, min(dp.d + e2.w) AS d
                  FROM e2 JOIN dp ON e2.src = dp.v GROUP BY 1)
           SELECT 'O:' || (SELECT k FROM src) AS v, 0.0 AS dist
           UNION ALL SELECT v, round(d, 5) FROM dp
           UNION ALL SELECT v, round(d, 5) FROM ds""",
    ),
    "q27_rdfs_inference": (
        _q_inference,
        """SELECT (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier) AS n_party""",
    ),
    "q28_pagerank": (_q_pagerank, _pagerank_oracle()),
    "q29_fulltext_docs": (_q_fulltext, _fulltext_oracle(["spark", "query", "join"])),
    "q20_construct": (
        _q_construct,
        """SELECT DISTINCT 'urn:tpch:customer:' || c_custkey AS s,
                  'urn:tpch:viz#inNation' AS p, n_name AS o
           FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    ),
    "q33_describe": (
        _q_describe,
        # the direct-mapping triples of nation 0 + reverse FK arcs
        """SELECT 'urn:tpch:nation:0' AS s,
                  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                  'urn:tpch:class:nation' AS o
           UNION ALL
           SELECT 'urn:tpch:nation:0', 'urn:tpch:nation#n_nationkey',
                  n_nationkey::VARCHAR FROM nation WHERE n_nationkey = 0
           UNION ALL
           SELECT 'urn:tpch:nation:0', 'urn:tpch:nation#n_name', n_name
           FROM nation WHERE n_nationkey = 0
           UNION ALL
           SELECT 'urn:tpch:nation:0', 'urn:tpch:nation#n_regionkey',
                  n_regionkey::VARCHAR FROM nation WHERE n_nationkey = 0
           UNION ALL
           SELECT 'urn:tpch:nation:0', 'urn:tpch:nation#n_regionkey_ref',
                  'urn:tpch:region:' || n_regionkey
           FROM nation WHERE n_nationkey = 0
           UNION ALL
           SELECT 'urn:tpch:customer:' || c_custkey,
                  'urn:tpch:customer#c_nationkey_ref', 'urn:tpch:nation:0'
           FROM customer WHERE c_nationkey = 0
           UNION ALL
           SELECT 'urn:tpch:supplier:' || s_suppkey,
                  'urn:tpch:supplier#s_nationkey_ref', 'urn:tpch:nation:0'
           FROM supplier WHERE s_nationkey = 0""",
    ),
    "q21_ask": (
        _q_ask,
        "SELECT EXISTS(SELECT 1 FROM customer WHERE c_acctbal > 9000.0) AS ask",
    ),
    "q22_gas_bfs": (
        _q_bfs,
        """WITH RECURSIVE walk(v, depth) AS (
             SELECT 'urn:tpch:region:0', 0
             UNION
             SELECT e.dst, walk.depth + 1
             FROM walk JOIN (
               SELECT 'urn:tpch:region:' || n_regionkey AS src,
                      'urn:tpch:nation:' || n_nationkey AS dst FROM nation
               UNION ALL
               SELECT 'urn:tpch:nation:' || c_nationkey,
                      'urn:tpch:customer:' || c_custkey FROM customer
               UNION ALL
               SELECT 'urn:tpch:nation:' || s_nationkey,
                      'urn:tpch:supplier:' || s_suppkey FROM supplier
             ) e ON e.src = walk.v
           )
           SELECT v, min(depth) AS depth FROM walk GROUP BY v""",
    ),
    "q30_gas_sssp": (
        _q_sssp,
        # unit-weight SSSP ≡ BFS depth (reference SSSP v1, SSSP.java:53)
        """WITH RECURSIVE walk(v, dist) AS (
             SELECT 'urn:tpch:region:0', 0
             UNION
             SELECT e.dst, walk.dist + 1
             FROM walk JOIN (
               SELECT 'urn:tpch:region:' || n_regionkey AS src,
                      'urn:tpch:nation:' || n_nationkey AS dst FROM nation
               UNION ALL
               SELECT 'urn:tpch:nation:' || c_nationkey,
                      'urn:tpch:customer:' || c_custkey FROM customer
               UNION ALL
               SELECT 'urn:tpch:nation:' || s_nationkey,
                      'urn:tpch:supplier:' || s_suppkey FROM supplier
             ) e ON e.src = walk.v
           )
           SELECT v, min(dist) AS dist FROM walk GROUP BY v""",
    ),
    "q31_gas_cc": (
        _q_cc,
        # undirected reachability fixpoint; component = min reachable
        # vertex IRI (CC.java:71 min-label convention)
        """WITH RECURSIVE
           edges AS (
             SELECT 'urn:tpch:region:' || n_regionkey AS src,
                    'urn:tpch:nation:' || n_nationkey AS dst FROM nation
             UNION ALL
             SELECT 'urn:tpch:nation:' || c_nationkey,
                    'urn:tpch:customer:' || c_custkey FROM customer
             UNION ALL
             SELECT 'urn:tpch:nation:' || s_nationkey,
                    'urn:tpch:supplier:' || s_suppkey FROM supplier
           ),
           und AS (
             SELECT src, dst FROM edges
             UNION SELECT dst AS src, src AS dst FROM edges
           ),
           reach(v, r) AS (
             SELECT src, src FROM und
             UNION
             SELECT reach.v, und.dst FROM reach JOIN und ON und.src = reach.r
           )
           SELECT v, min(r) AS component FROM reach GROUP BY v""",
    ),
    "q32_quads_graph_join": (
        _q_quads_graph_join,
        # the graph discriminator is the source table name
        """SELECT 'urn:tpch:graph:customer' AS g, n_name AS nation,
                  count(*) AS n_cust
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name""",
    ),
    "q35_update_using": (
        _q_update_using,
        # audit  = one triple per typed subject of region+nation ONLY
        # audit2 = one triple per region r_name
        """SELECT 'urn:tpch:graph:audit' AS g,
                  (SELECT count(*) FROM region) + (SELECT count(*) FROM nation) AS n
           UNION ALL
           SELECT 'urn:tpch:graph:audit2' AS g,
                  (SELECT count(*) FROM region) AS n""",
    ),
}


def _p_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_old_spark.pipeline.text import tfidf_keywords

    docs = _read(spark, sf_dir, "documents")
    return tfidf_keywords(docs, k=5)


_PIPELINE_QUERIES: dict[str, tuple] = {
    "p49_url_dedup": (
        _p_url_dedup,
        r"""WITH urls AS (
             SELECT doc_id,
                    CASE WHEN doc_id % 2 = 0
                         THEN 'https://WWW.Example.com/p/' || (doc_id // 2) || '/'
                         ELSE 'HTTP://example.com:80/p/' || (doc_id // 2) || '?utm=1#f'
                    END AS url
             FROM documents),
           canon AS (
             SELECT doc_id, url,
                    regexp_replace(regexp_replace(
                        lower(regexp_extract(
                            regexp_replace(regexp_replace(regexp_replace(url,
                                '#.*$', ''), '\?.*$', ''),
                                '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                            '^([^/?]*)', 1)),
                        '^www\.', ''), ':(80|443)$', '')
                    ||
                    regexp_replace(regexp_extract(
                        regexp_replace(regexp_replace(regexp_replace(url,
                            '#.*$', ''), '\?.*$', ''),
                            '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                        '^[^/?]*([/?].*)?$', 1), '/$', '')
                    AS k
             FROM urls),
           keep AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY k)
           SELECT c.doc_id, c.url FROM canon c JOIN keep USING (doc_id)""",
    ),
    "p46_tfidf_keywords": (
        _p_tfidf_keywords,
        r"""WITH toks AS (SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                          x -> x <> '')) AS term
                FROM documents),
           tf AS (SELECT doc_id, term, count(*)::DOUBLE AS c FROM toks GROUP BY ALL),
           dl AS (SELECT doc_id, sum(c) AS n FROM tf GROUP BY 1),
           dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
           nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
           score AS (SELECT tf.doc_id, tf.term,
                            (tf.c / dl.n) * (ln((nd.n_docs + 1) / (dfreq.df + 1)) + 1) AS s
                     FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd),
           rk AS (SELECT doc_id, term, s,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY s DESC, term) AS rank
                  FROM score)
           SELECT doc_id, term, round(s, 6) AS score, rank
           FROM rk WHERE rank <= 5""",
    ),
    # name: (callable, oracle sql | None)
    "p35_duplicate_spans": (
        _p_duplicate_spans,
        """WITH t AS (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                         x -> x <> '') AS toks
                      FROM documents),
           w AS (SELECT doc_id, unnest(range(1, len(toks)-8+2)) AS i, toks
                 FROM t WHERE len(toks) >= 8),
           wk AS (SELECT doc_id, i,
                         md5(array_to_string(toks[i:i+7], ' ')) AS wkey FROM w),
           dup AS (SELECT wkey FROM wk GROUP BY wkey HAVING count(*) >= 2),
           cov AS (SELECT DISTINCT doc_id, p FROM (
                     SELECT doc_id, unnest(range(i, i+8)) AS p
                     FROM wk WHERE wkey IN (SELECT wkey FROM dup))),
           agg AS (SELECT doc_id, count(*) AS n_dup FROM cov GROUP BY 1)
           SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
                  coalesce(agg.n_dup, 0)::BIGINT AS n_dup_tokens,
                  round(coalesce(agg.n_dup, 0) / greatest(len(t.toks), 1), 5) AS dup_frac
           FROM t LEFT JOIN agg USING (doc_id)""",
    ),
    "p36_quality_classifier": (
        _p_quality_classifier,
        # one GD step from w=0: sigmoid(0)=1/2 makes the gradient a
        # closed-form aggregate, so training replays as plain SQL
        """WITH lab AS (SELECT doc_id,
                               CASE WHEN doc_id % 11 = 0 THEN 1.0 ELSE 0.0 END AS y,
                               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                           x -> x <> '') AS toks
                        FROM documents),
           feats AS (SELECT doc_id, y, substr(md5(unnest(toks)), 1, 2) AS feat FROM lab),
           per AS (SELECT doc_id, y, feat, count(*)::DOUBLE AS cnt FROM feats GROUP BY ALL),
           tot AS (SELECT doc_id, count(*)::DOUBLE AS tot FROM feats GROUP BY 1),
           x AS (SELECT p.doc_id, p.y, p.feat, p.cnt / t.tot AS x
                 FROM per p JOIN tot t USING (doc_id)),
           nd AS (SELECT count(*)::DOUBLE AS n FROM lab),
           w AS (SELECT feat, -sum((0.5 - y) * x) / (SELECT n FROM nd) AS w
                 FROM x GROUP BY 1),
           bias AS (SELECT -sum(0.5 - y) / (SELECT n FROM nd) AS b FROM lab),
           z AS (SELECT l.doc_id,
                        coalesce(sum(xx.x * w.w), 0) + (SELECT b FROM bias) AS z
                 FROM lab l LEFT JOIN x xx ON xx.doc_id = l.doc_id
                            LEFT JOIN w ON w.feat = xx.feat
                 GROUP BY 1)
           SELECT doc_id, round(1 / (1 + exp(-z)), 5) AS quality_prob FROM z""",
    ),
    "p37_bm25_topk": (
        _p_bm25,
        """WITH base AS (SELECT doc_id,
                                list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                            x -> x <> '') AS toks
                         FROM documents),
           lens AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM base),
           stats AS (SELECT count(*)::DOUBLE AS N, avg(dl) AS avgdl FROM lens),
           post AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM (
                      SELECT doc_id, unnest(toks) AS tok FROM base)
                    WHERE tok IN ('spark', 'query', 'join') GROUP BY 1, 2),
           dfreq AS (SELECT tok, count(*)::DOUBLE AS df FROM post GROUP BY 1),
           scored AS (SELECT p.doc_id,
                             sum(ln(1 + (s.N - d.df + 0.5) / (d.df + 0.5))
                                 * (p.tf * 2.2)
                                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))) AS score
                      FROM post p JOIN dfreq d USING (tok)
                                  JOIN lens l USING (doc_id) CROSS JOIN stats s
                      GROUP BY 1)
           SELECT doc_id, round(score, 5) AS score, rank FROM (
             SELECT doc_id, score,
                    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             FROM scored)
           WHERE rank <= 20""",
    ),
    "p38_event_funnel": (
        _p_funnel,
        """WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
                       WHERE event_type = 'view' GROUP BY 1),
           t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e JOIN t1 USING (user_id)
                  WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1),
           t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e JOIN t2 USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1)
           SELECT t1.user_id,
                  CASE WHEN ts3 IS NOT NULL THEN 3
                       WHEN ts2 IS NOT NULL THEN 2 ELSE 1 END AS stage,
                  floor(epoch(coalesce(ts3, ts2, ts1)))::BIGINT AS stage_ts
           FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)""",
    ),
    "p01_dedup_exact": (
        _p_dedup_exact,
        """SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
                  min(doc_id) AS keep_id, count(*) AS n_dups
           FROM documents GROUP BY 1""",
    ),
    "p02_text_profile": (
        _p_text_profile,
        """SELECT doc_id,
                  len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                  length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                  length(text) AS n_chars_m
           FROM documents""",
    ),
    "p03_ann_bruteforce_topk": (
        _p_ann_topk,
        """SELECT q.vec_id AS q_id, e.vec_id,
                  round(list_cosine_similarity(q.embedding, e.embedding), 5) AS sim,
                  row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
                  ) AS rnk
           FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
           CROSS JOIN embeddings e
           QUALIFY rnk <= 10""",
    ),
    "p28_quantized_topk": (
        _p_quantized_topk,
        # identical SQ8 grid: scale = 127/max|x| over the corpus,
        # q = clamp(floor(x*scale+0.5), -127, 127); rank by integer dot
        """WITH s AS (
             SELECT 127.0 / max(list_max(list_transform(embedding,
                                x -> abs(x::DOUBLE)))) AS scale
             FROM embeddings
           ), q8 AS (
             SELECT vec_id,
                    list_transform(embedding,
                      x -> least(greatest(floor(x::DOUBLE * scale + 0.5),
                                          -127.0), 127.0)) AS qv
             FROM embeddings, s
           )
           SELECT q.vec_id AS q_id, e.vec_id,
                  list_dot_product(q.qv, e.qv)::BIGINT AS qdot,
                  row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_dot_product(q.qv, e.qv) DESC, e.vec_id
                  ) AS rnk
           FROM (SELECT * FROM q8 WHERE vec_id < 5) q
           CROSS JOIN q8 e
           QUALIFY rnk <= 10""",
    ),
    "p09_ivf_topk_fullprobe": (
        _p_ivf_topk,
        # nprobe == n_centroids ⇒ IVF provably equals the exact top-k,
        # so the brute-force oracle value-checks the IVF machinery
        """SELECT q.vec_id AS q_id, e.vec_id,
                  round(list_cosine_similarity(q.embedding, e.embedding), 5) AS sim,
                  row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
                  ) AS rnk
           FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
           CROSS JOIN embeddings e
           QUALIFY rnk <= 10""",
    ),
    "p22_ivf_index_search": (
        _p_ivf_index_search,
        # full probe of the PERSISTED inverted lists ≡ exact top-k
        """SELECT q.vec_id AS q_id, e.vec_id,
                  round(list_cosine_similarity(q.embedding, e.embedding), 5) AS sim,
                  row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
                  ) AS rnk
           FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
           CROSS JOIN embeddings e
           QUALIFY rnk <= 10""",
    ),
    "p10_cosine_near_dup": (
        _p_cosine_near_dup,
        """WITH base AS (
             SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
           ),
           aug AS (
             SELECT id, v FROM base
             UNION ALL
             SELECT e.id + 100000,
                    list_transform(range(1, 1 + len(e.v)),
                                   i -> e.v[i] * 0.98 + n.v[i] * 0.02)
             FROM base e JOIN base n ON n.id = e.id + 1
             WHERE e.id % 10 = 0
           )
           SELECT a.id AS id_a, b.id AS id_b,
                  round(list_cosine_similarity(a.v, b.v), 5) AS sim
           FROM aug a JOIN aug b ON a.id < b.id
           WHERE list_cosine_similarity(a.v, b.v) >= 0.98""",
    ),
    "p11_stratified_sample": (
        _p_stratified_sample,
        """SELECT doc_id, lang, n_chars FROM (
             SELECT doc_id, lang, n_chars,
                    row_number() OVER (
                      PARTITION BY lang
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ) AS rn
             FROM documents) WHERE rn <= 20""",
    ),
    "p12_hash_split": (
        _p_hash_split,
        """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('0','1') THEN 'test' ELSE 'train' END AS side,
                  count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
           FROM documents GROUP BY side""",
    ),
    "p13_pack_sequences": (
        _p_pack_sequences,
        """WITH t AS (
             SELECT doc_id, doc_id % 8 AS bucket,
                    len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS n_tokens
             FROM documents
           ), c AS (
             SELECT *, CAST(coalesce(sum(n_tokens) OVER (
                         PARTITION BY bucket ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS BIGINT) AS cb
             FROM t
           )
           SELECT doc_id, bucket, n_tokens,
                  cb // 512 AS seq_id,
                  cb % 512 AS seq_offset,
                  greatest(cb // 512, (cb + n_tokens - 1) // 512) AS end_seq_id
           FROM c""",
    ),
    "p14_repetition_signals": (
        _p_repetition,
        """WITH base AS (
             SELECT doc_id,
                    list_filter(list_transform(regexp_split_to_array(text, '\\n'),
                                               x -> trim(x)), x -> x <> '') AS lines,
                    list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> '') AS words
             FROM documents
           ), l AS (
             SELECT doc_id, len(lines) AS n_lines,
                    CASE WHEN len(lines) > 0
                         THEN round(1.0 - len(list_distinct(lines)) / (1.0 * len(lines)), 9)
                         ELSE 0.0 END AS dup_line_frac,
                    words
             FROM base
           ), g AS (
             SELECT doc_id,
                    unnest(CASE WHEN len(words) >= 2
                           THEN list_transform(range(1, len(words)),
                                               i -> words[i] || ' ' || words[i+1])
                           ELSE [] END) AS gram
             FROM l
           ), cnt AS (
             SELECT doc_id, gram, count(*) AS c FROM g GROUP BY ALL
           ), top AS (
             SELECT doc_id, round(max(c) / (1.0 * sum(c)), 9) AS top_bigram_frac
             FROM cnt GROUP BY doc_id
           )
           SELECT l.doc_id, n_lines, dup_line_frac,
                  coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
           FROM l LEFT JOIN top ON l.doc_id = top.doc_id""",
    ),
    "p18_seeded_shuffle": (
        _p_seeded_shuffle,
        """SELECT doc_id,
                  md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_rank,
                  CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) AS shuffle_rank_64
           FROM documents""",
    ),
    "p19_group_split": (
        _p_group_split,
        """SELECT CASE WHEN substr(md5(lang), 1, 1) IN ('0','1','2','3')
                       THEN 'test' ELSE 'train' END AS side,
                  count(*) AS n,
                  CAST(sum(doc_id) AS BIGINT) AS id_sum,
                  count(DISTINCT lang) AS n_groups
           FROM documents GROUP BY side""",
    ),
    "p16_ngram_contamination": (
        _p_decontam,
        """WITH tok AS (
             SELECT doc_id,
                    list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> '') AS w
             FROM documents
           ), tg AS (
             SELECT doc_id,
                    list_distinct(
                      CASE WHEN len(w) >= 3
                           THEN list_transform(range(1, len(w) - 1),
                                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                           ELSE [] END) AS grams
             FROM tok
           ), t AS (
             SELECT doc_id, unnest(grams) AS gram FROM tg
           ), e AS (
             SELECT DISTINCT unnest(grams) AS gram FROM tg WHERE doc_id % 20 = 0
           ), agg AS (
             SELECT t.doc_id, count(*) AS n_ngrams, count(e.gram) AS n_contaminated
             FROM t LEFT JOIN e ON t.gram = e.gram
             GROUP BY t.doc_id
           )
           SELECT d.doc_id,
                  coalesce(n_ngrams, 0) AS n_ngrams,
                  coalesce(n_contaminated, 0) AS n_contaminated,
                  CASE WHEN coalesce(n_ngrams, 0) > 0
                       THEN round(n_contaminated / (1.0 * n_ngrams), 9)
                       ELSE 0.0 END AS contamination_frac,
                  CASE WHEN coalesce(n_ngrams, 0) > 0
                       THEN round(n_contaminated / (1.0 * n_ngrams), 9) >= 0.2
                       ELSE FALSE END AS is_contaminated
           FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""",
    ),
    "p17_pii_redact": (
        _p_pii_redact,
        """WITH aug AS (
             SELECT doc_id,
                    text || CASE WHEN doc_id % 7 = 0
                            THEN ' Contact user' || CAST(doc_id AS VARCHAR)
                                 || '@example.com or 10.0.'
                                 || CAST(doc_id % 200 AS VARCHAR)
                                 || '.1 or +1 555-000-'
                                 || CAST(doc_id % 10000 AS VARCHAR)
                            ELSE '' END AS text
             FROM documents
           )
           SELECT doc_id,
                  CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                  CAST(len(regexp_extract_all(text,
                    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
                  CAST(len(regexp_extract_all(text,
                    '\\+\\d[\\d\\- ]{7,14}\\d')) AS BIGINT) AS n_phone,
                  CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                   + len(regexp_extract_all(text,
                    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                   + len(regexp_extract_all(text,
                    '\\+\\d[\\d\\- ]{7,14}\\d')) AS BIGINT) AS n_pii,
                  regexp_replace(regexp_replace(regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                    '\\+\\d[\\d\\- ]{7,14}\\d', '<PHONE>', 'g') AS redacted
           FROM aug""",
    ),
    "p15_multimodal_features": (
        _p_multimodal,
        """WITH m AS (SELECT unnest(range(64)) AS media_id),
           c AS (
             SELECT media_id,
                    repeat(md5(CAST(media_id AS VARCHAR)), 4) AS content
             FROM m
           ), s AS (
             SELECT media_id, sha256(content) AS sha256,
                    CAST(length(content) AS BIGINT) AS n_bytes
             FROM c
           ), j AS (SELECT unnest(range(16)) AS pos)
           SELECT media_id, sha256, n_bytes, CAST(pos AS BIGINT) AS pos,
                  CAST(16 * (strpos('0123456789abcdef',
                                    substr(sha256, 1 + 2 * pos, 1)) - 1)
                          + (strpos('0123456789abcdef',
                                    substr(sha256, 2 + 2 * pos, 1)) - 1)
                       AS BIGINT) AS fbyte
           FROM s, j""",
    ),
    "p20_lsh_topk_exhaustive": (
        _p_lsh_topk,
        # one bucket ⇒ LSH provably equals the exact top-k, so the
        # brute-force oracle value-checks the LSH machinery (cf. p09)
        """SELECT q.vec_id AS q_id, e.vec_id,
                  round(list_cosine_similarity(q.embedding, e.embedding), 5) AS sim,
                  row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
                  ) AS rnk
           FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
           CROSS JOIN embeddings e
           QUALIFY rnk <= 10""",
    ),
    "p04_minhash_lsh_pairs": (_p_minhash_pairs, _ngram_jaccard_oracle()),
    "p05_simhash_pairs": (_p_simhash_pairs, _simhash_oracle()),
    "p06_quality_langid": (_p_quality_lang, _quality_lang_oracle()),
    "p07_dedup_clusters": (_p_dedup_clusters, _dedup_clusters_oracle()),
    "p48_top_ngrams": (
        _p_top_ngrams,
        r"""WITH base AS (SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
           g AS (SELECT doc_id,
                        unnest(list_distinct(
                          CASE WHEN len(toks) >= 3
                               THEN list_transform(generate_series(1, len(toks) - 2),
                                                   i -> array_to_string(toks[i:i+2], ' '))
                               ELSE [] END)) AS gram
                 FROM base)
           SELECT gram, count(*)::BIGINT AS cnt FROM g
           GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20""",
    ),
    "p47_quality_canonical": (
        _p_quality_canonical,
        # p07's recursive-CTE clusters, but the keep flag goes to the
        # LONGEST member (token count; ties → min id)
        _dedup_clusters_oracle().replace(
            "SELECT src AS doc_id, min(v) AS cluster_id, (src = min(v)) AS is_keep\n"
            "FROM reach GROUP BY src",
            """, cl AS (SELECT src AS doc_id, min(v) AS cluster_id FROM reach GROUP BY src)
, sc AS (SELECT doc_id, len(toks) AS s FROM base)
, rk AS (SELECT cl.doc_id, cl.cluster_id,
                row_number() OVER (PARTITION BY cl.cluster_id
                                   ORDER BY sc.s DESC, cl.doc_id) AS rn
         FROM cl JOIN sc USING (doc_id))
SELECT doc_id, cluster_id, (rn = 1) AS is_keep FROM rk"""),
    ),
    "p08_sessionize": (_p_sessionize, _sessionize_oracle()),
    "p30_temperature_resample": (
        _p_temperature_resample,
        # identical targets: round(N * n^0.5 / sum n^0.5) capped at n;
        # identical per-source (md5(id), id) selection order
        """WITH d AS (
             SELECT doc_id,
                    CASE WHEN doc_id % 10 < 6 THEN 'big'
                         WHEN doc_id % 10 < 9 THEN 'mid'
                         ELSE 'small' END AS src
             FROM documents
           ), c AS (
             SELECT src, count(*)::DOUBLE AS n FROM d GROUP BY src
           ), tot AS (
             SELECT sum(pow(n, 0.5)) AS wsum, sum(n) AS big_n FROM c
           ), tg AS (
             SELECT src,
                    least(n, floor(big_n * pow(n, 0.5) / wsum + 0.5)) AS target
             FROM c, tot
           ), r AS (
             SELECT doc_id, src,
                    row_number() OVER (
                      PARTITION BY src
                      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
             FROM d
           )
           SELECT r.doc_id, r.src FROM r JOIN tg USING (src)
           WHERE rn <= target""",
    ),
    "p31_semantic_dedup": (
        _p_semantic_dedup,
        # same twin augmentation as p10; keep = no same-or-better
        # (smaller-id) neighbor at cosine >= 0.98 anywhere (1 cluster)
        """WITH base AS (
             SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
           ),
           aug AS (
             SELECT id, v FROM base
             UNION ALL
             SELECT e.id + 100000,
                    list_transform(range(1, 1 + len(e.v)),
                                   i -> e.v[i] * 0.98 + n.v[i] * 0.02)
             FROM base e JOIN base n ON n.id = e.id + 1
             WHERE e.id % 10 = 0
           )
           SELECT a.id FROM aug a
           WHERE NOT EXISTS (
             SELECT 1 FROM aug b
             WHERE b.id < a.id
               AND list_cosine_similarity(a.v, b.v) >= 0.98)""",
    ),
    "p32_c4_clean": (
        _p_c4_clean,
        # same 8-token re-chunking with '.' on chunks at s % 16 == 1,
        # then the C4 line rules (>= 5 words, terminal punct, no
        # javascript) and doc rules (>= 3 sentences, no lorem ipsum /
        # braces, anything retained)
        """WITH base AS (
             SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
             FROM documents
           ), lined AS (
             SELECT doc_id,
                    array_to_string(
                      list_transform(
                        generate_series(1, greatest(len(toks), 1), 8),
                        s -> array_to_string(toks[s:s+7], ' ') ||
                             CASE WHEN s % 16 = 1 THEN '.' ELSE '' END),
                      chr(10)) AS text
             FROM base
           ), cleaned AS (
             SELECT doc_id,
                    array_to_string(
                      list_filter(string_split(text, chr(10)),
                        l -> len(list_filter(
                               regexp_split_to_array(trim(l), '\\s+'),
                               x -> x <> '')) >= 5
                             AND NOT contains(lower(l), 'javascript')
                             AND regexp_matches(trim(l), '[.!?"]\\s*$')),
                      chr(10)) AS clean_text
             FROM lined
           ), sig AS (
             SELECT doc_id, clean_text,
                    CASE WHEN clean_text = '' THEN 0
                         ELSE len(string_split(clean_text, chr(10)))
                    END AS n_lines_kept,
                    len(regexp_extract_all(clean_text, '[.!?]+'))
                      AS n_sentences
             FROM cleaned
           )
           SELECT doc_id, clean_text, n_lines_kept, n_sentences,
                  (n_lines_kept > 0 AND n_sentences >= 3
                   AND NOT contains(lower(clean_text), 'lorem ipsum')
                   AND NOT contains(clean_text, '{')
                   AND NOT contains(clean_text, '}')) AS keep
           FROM sig""",
    ),
    "p33_dsir_scores": (
        _p_dsir_scores,
        # hashed-unigram (2-hex md5 prefix, 256 buckets) Laplace-
        # smoothed log-likelihood ratio, target = doc_id % 11 = 0
        """WITH feat AS (
             SELECT doc_id,
                    substr(md5(unnest(list_filter(
                      regexp_split_to_array(lower(text), '\\s+'),
                      t -> t <> ''))), 1, 2) AS feat
             FROM documents
           ), tgt AS (
             SELECT feat, count(*) AS c FROM feat
             WHERE doc_id % 11 = 0 GROUP BY feat
           ), ttot AS (
             SELECT count(*)::DOUBLE AS n FROM feat WHERE doc_id % 11 = 0
           ), raw AS (
             SELECT feat, count(*) AS c FROM feat GROUP BY feat
           ), rtot AS (
             SELECT count(*)::DOUBLE AS n FROM feat
           ), w AS (
             SELECT coalesce(t.feat, r.feat) AS feat,
                    ln((coalesce(t.c, 0) + 1.0) / (ttot.n + 256.0))
                    - ln((coalesce(r.c, 0) + 1.0) / (rtot.n + 256.0)) AS lw
             FROM tgt t FULL JOIN raw r ON t.feat = r.feat, ttot, rtot
           ), sc AS (
             SELECT f.doc_id, sum(w.lw) AS s
             FROM feat f JOIN w USING (feat) GROUP BY f.doc_id
           )
           SELECT d.doc_id, round(coalesce(sc.s, 0.0), 5) AS dsir_logratio
           FROM documents d LEFT JOIN sc USING (doc_id)""",
    ),
    "p34_containment_pairs": (
        _p_containment,
        # same superset-twin augmentation; containment over DISTINCT
        # 3-token shingles, all ordered pairs, both directions
        f"""WITH d AS (
             SELECT doc_id, text FROM documents
             UNION ALL
             SELECT a.doc_id + 100000, a.text || ' ' || b.text
             FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             WHERE a.doc_id % 10 = 0
           ), base AS (
             SELECT doc_id, {_TOKS} AS toks FROM d
           ), sh AS (
             SELECT doc_id,
                    CASE WHEN len(toks) >= 3
                         THEN list_distinct(list_transform(
                                generate_series(1, len(toks) - 2),
                                i -> array_to_string(toks[i:i+2], ' ')))
                         ELSE [array_to_string(toks, ' ')] END AS sh
             FROM base
           ), pairs AS (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh) AS c
             FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
             WHERE len(a.sh) >= 1
           )
           SELECT id_a, id_b, round(c, 5) AS containment
           FROM pairs WHERE c >= 0.9""",
    ),
    "p29_gopher_quality": (
        _p_gopher_quality,
        # same rules: word bounds, mean word length, symbol ratio,
        # bullet/ellipsis line fractions, alpha fraction, stopwords
        """WITH base AS (
             SELECT doc_id, text,
                    list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> '') AS toks,
                    string_split(text, chr(10)) AS lines
             FROM documents
           ), sig AS (
             SELECT doc_id,
                    len(toks) AS n_words,
                    CASE WHEN len(toks) > 0
                         THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                              / len(toks)
                         ELSE 0.0 END AS mean_wl,
                    (len(regexp_extract_all(text, '#'))
                     + len(regexp_extract_all(text, '\\.\\.\\.'))
                     + len(regexp_extract_all(text, '…'))) AS n_sym,
                    len(lines) AS n_lines,
                    len(list_filter(lines,
                        l -> regexp_matches(trim(l), '^[•\\-\\*]'))) AS n_bullet,
                    len(list_filter(lines,
                        l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS n_ell,
                    len(list_filter(toks,
                        l -> regexp_matches(l, '[A-Za-z]'))) AS n_alpha,
                    len(list_filter(toks,
                        x -> list_contains(['the','be','to','of','and','that',
                                            'have','with'], lower(x)))) AS n_stop
             FROM base
           )
           SELECT doc_id,
                  n_words::BIGINT AS n_words,
                  round(mean_wl, 5) AS mean_word_len,
                  round(CASE WHEN n_words > 0 THEN n_sym / n_words
                             ELSE 0.0 END, 5) AS symbol_ratio,
                  round(n_bullet / n_lines, 5) AS bullet_frac,
                  round(n_ell / n_lines, 5) AS ellipsis_frac,
                  round(CASE WHEN n_words > 0 THEN n_alpha / n_words
                             ELSE 0.0 END, 5) AS alpha_frac,
                  n_stop::BIGINT AS n_stopwords,
                  (n_words BETWEEN 50 AND 100000
                   AND mean_wl BETWEEN 3.0 AND 10.0
                   AND (CASE WHEN n_words > 0 THEN n_sym / n_words
                             ELSE 0.0 END) <= 0.1
                   AND n_bullet / n_lines <= 0.9
                   AND n_ell / n_lines <= 0.3
                   AND (CASE WHEN n_words > 0 THEN n_alpha / n_words
                             ELSE 0.0 END) >= 0.8
                   AND n_stop >= 2) AS passes
           FROM sig""",
    ),
    "p27_line_dedup": (
        _p_line_dedup,
        # same 8-token re-chunking, then drop lines in >= 2 distinct docs
        """WITH base AS (
             SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
             FROM documents
           ), lined AS (
             SELECT doc_id,
                    array_to_string(
                      list_transform(
                        generate_series(1, greatest(len(toks), 1), 8),
                        s -> array_to_string(toks[s:s+7], ' ')),
                      chr(10)) AS text
             FROM base
           ), lines AS (
             SELECT doc_id,
                    unnest(string_split(text, chr(10))) AS line,
                    generate_subscripts(string_split(text, chr(10)), 1) AS pos
             FROM lined
           ), boiler AS (
             SELECT line FROM lines GROUP BY line
             HAVING count(DISTINCT doc_id) >= 2
           ), kept AS (
             SELECT l.doc_id, l.pos, l.line
             FROM lines l ANTI JOIN boiler b ON l.line = b.line
           ), rebuilt AS (
             SELECT doc_id,
                    string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
                    count(*) AS n_kept
             FROM kept GROUP BY doc_id
           )
           SELECT d.doc_id,
                  coalesce(r.text_dedup, '') AS text_dedup,
                  len(string_split(d.text, chr(10)))::BIGINT AS n_lines,
                  (len(string_split(d.text, chr(10)))
                     - coalesce(r.n_kept, 0))::BIGINT AS n_removed
           FROM lined d LEFT JOIN rebuilt r USING (doc_id)""",
    ),
    "p26_chunk_documents": (
        _p_chunk_documents,
        # same 1-based starts: 1, 1+56, … up to greatest(n-8, 1)
        f"""WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
           st AS (
             SELECT doc_id, toks,
                    unnest(generate_series(1, greatest(len(toks) - 8, 1), 56)) AS s,
                    generate_subscripts(generate_series(1, greatest(len(toks) - 8, 1), 56), 1) - 1 AS chunk_id
             FROM base
           ),
           c AS (
             SELECT doc_id, chunk_id::BIGINT AS chunk_id,
                    toks[s:s+63] AS ck
             FROM st
           )
           SELECT doc_id, chunk_id, len(ck)::BIGINT AS n_tokens,
                  array_to_string(ck, ' ') AS chunk_text
           FROM c WHERE len(ck) > 0""",
    ),
    "p25_fuzzy_decontam": (
        _p_fuzzy_decontam,
        # exact shingle-Jaccard cross pairs train x eval at j >= 0.4
        f"""WITH base AS (
             SELECT doc_id, {_TOKS} AS toks FROM documents
           ), sh AS (
             SELECT doc_id,
                    CASE WHEN len(toks) >= 3
                         THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                           i -> array_to_string(toks[i:i+2], ' ')))
                         ELSE [array_to_string(toks, ' ')] END AS sh
             FROM base
           )
           SELECT id_train, id_eval, round(j, 5) AS jaccard FROM (
             SELECT t.doc_id AS id_train, e.doc_id AS id_eval,
                    CASE WHEN len(list_distinct(list_concat(t.sh, e.sh))) > 0
                         THEN len(list_intersect(t.sh, e.sh))::DOUBLE
                              / len(list_distinct(list_concat(t.sh, e.sh)))
                         ELSE 1.0 END AS j
             FROM sh t JOIN sh e
               ON t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
           ) WHERE j >= 0.4""",
    ),
    "p24_token_budget_mix": (
        _p_token_budget_mix,
        # same (md5(id), id)-ordered per-source cumsum-before-target rule
        f"""WITH d AS (
             SELECT doc_id,
                    ['web','code','books'][(doc_id % 3 + 1)::INT] AS source,
                    len({_TOKS})::BIGINT AS n_tokens
             FROM documents
           ),
           t AS (
             SELECT *,
                    CASE source WHEN 'web' THEN 1800.0
                                WHEN 'code' THEN 900.0
                                ELSE 300.0 END AS target,
                    COALESCE(SUM(n_tokens) OVER (
                      PARTITION BY source
                      ORDER BY md5(doc_id::VARCHAR), doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) AS cum_before
             FROM d
           )
           SELECT doc_id, source, n_tokens FROM t WHERE cum_before < target""",
    ),
    "p39_unimax_mix": (
        _p_unimax_mix,
        # ascending water-filling unrolled over the three sources; the
        # same double math as the driver-side allocation loop
        f"""WITH d AS (
             SELECT doc_id,
                    ['web','code','books'][(doc_id % 3 + 1)::INT] AS source,
                    len({_TOKS})::BIGINT AS n_tokens
             FROM documents
           ),
           srcs AS (SELECT source, sum(n_tokens)::DOUBLE AS ns FROM d GROUP BY 1),
           ord AS (SELECT source, ns,
                          row_number() OVER (ORDER BY ns, source) AS r FROM srcs),
           a1 AS (SELECT source, ns, least(ns * 2, 5000.0 / 3) AS alloc
                  FROM ord WHERE r = 1),
           a2 AS (SELECT o.source, o.ns,
                         least(o.ns * 2, (5000.0 - a1.alloc) / 2) AS alloc
                  FROM ord o, a1 WHERE o.r = 2),
           a3 AS (SELECT o.source, o.ns,
                         least(o.ns * 2, 5000.0 - a1.alloc - a2.alloc) AS alloc
                  FROM ord o, a1, a2 WHERE o.r = 3),
           alloc AS (SELECT source, ns, floor(alloc / ns) AS fe,
                            alloc - floor(alloc / ns) * ns AS pt
                     FROM (SELECT * FROM a1 UNION ALL
                           SELECT * FROM a2 UNION ALL
                           SELECT * FROM a3)),
           t AS (SELECT d.doc_id, d.source, d.n_tokens, a.fe, a.pt,
                        COALESCE(SUM(d.n_tokens) OVER (
                          PARTITION BY d.source
                          ORDER BY md5(d.doc_id::VARCHAR), d.doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        ), 0) AS cum_before
                 FROM d JOIN alloc a USING (source))
           SELECT doc_id, source, n_tokens,
                  (fe + CASE WHEN cum_before < pt THEN 1 ELSE 0 END)::INT AS n_epochs
           FROM t
           WHERE fe + CASE WHEN cum_before < pt THEN 1 ELSE 0 END >= 1""",
    ),
    "p40_corpus_profile": (_p_corpus_profile, _corpus_profile_oracle()),
    "p42_winnowing_pairs": (_p_winnowing, _WINNOW_ORACLE),
    "p44_bpe_encode": (
        _p_bpe_encode,
        # zero merges: pieces = chars + '</w>' per word, so the count
        # is Σ(len(w)+1) and the concatenated stream is the words
        # joined by the end-of-word marker (with a trailing marker)
        f"""WITH t AS (SELECT doc_id, {_TOKS} AS words FROM documents)
           SELECT doc_id,
                  CAST(coalesce(list_sum(list_transform(words, w -> length(w) + 1)), 0)
                       AS BIGINT) AS n_bpe_tokens,
                  md5(coalesce(
                        array_to_string(list_transform(words, w -> w || '</w>'), ''),
                        '')) AS enc_hash
           FROM t""",
    ),
    "p43_hybrid_rrf": (
        _p_hybrid_rrf,
        """WITH base AS (SELECT doc_id,
                                list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                            x -> x <> '') AS toks
                         FROM documents),
           lens AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM base),
           stats AS (SELECT count(*)::DOUBLE AS N, avg(dl) AS avgdl FROM lens),
           post AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM (
                      SELECT doc_id, unnest(toks) AS tok FROM base)
                    WHERE tok IN ('spark', 'query', 'join') GROUP BY 1, 2),
           dfreq AS (SELECT tok, count(*)::DOUBLE AS df FROM post GROUP BY 1),
           bm AS (SELECT doc_id,
                         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
                  FROM (SELECT p.doc_id,
                               sum(ln(1 + (s.N - d.df + 0.5) / (d.df + 0.5))
                                   * (p.tf * 2.2)
                                   / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))) AS score
                        FROM post p JOIN dfreq d USING (tok)
                                    JOIN lens l USING (doc_id) CROSS JOIN stats s
                        GROUP BY 1))
                  ,
           vec AS (SELECT e.vec_id AS doc_id,
                          row_number() OVER (
                            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                     e.vec_id) AS rank
                   FROM (SELECT * FROM embeddings WHERE vec_id = 0) q
                   CROSS JOIN embeddings e),
           fused AS (SELECT doc_id, sum(1.0 / (60.0 + rank)) AS rrf_score FROM (
                       SELECT doc_id, rank FROM bm WHERE rank <= 50
                       UNION ALL
                       SELECT doc_id, rank FROM vec WHERE rank <= 50)
                     GROUP BY 1)
           SELECT doc_id, round(rrf_score, 8) AS rrf_score, rank FROM (
             SELECT doc_id, rrf_score,
                    row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
             FROM fused)
           WHERE rank <= 20""",
    ),
    "p41_edit_distance_pairs": (
        _p_edit_distance,
        """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  levenshtein(a.text, b.text) AS edit_distance
           FROM documents a JOIN documents b ON a.doc_id < b.doc_id
           WHERE abs(length(a.text) - length(b.text)) <= 60
             AND levenshtein(a.text, b.text) <= 60""",
    ),
    "p23_lm_perplexity": (
        _p_lm_perplexity,
        # add-one-smoothed bigram cross-entropy, identical math
        f"""WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
           bg AS (
             SELECT doc_id,
                    unnest(list_transform(generate_series(2, len(toks)),
                                          i -> toks[i-1] || chr(31) || toks[i])) AS bg
             FROM base WHERE len(toks) >= 2
           ),
           bgc AS (SELECT bg, count(*) AS cb FROM bg GROUP BY bg),
           pfx AS (SELECT split_part(bg, chr(31), 1) AS p, count(*) AS cp
                   FROM bg GROUP BY 1),
           v AS (SELECT count(DISTINCT t) AS vs FROM (
                   SELECT unnest(toks) AS t FROM base)),
           sc AS (
             SELECT b.doc_id,
                    ln((c.cb + 1.0) / (p.cp + v.vs)) AS lp
             FROM bg b
             JOIN bgc c USING (bg)
             JOIN pfx p ON p.p = split_part(b.bg, chr(31), 1)
             CROSS JOIN v
           )
           SELECT doc_id, count(*) AS n_bigrams,
                  round(-avg(lp), 5) AS cross_entropy
           FROM sc GROUP BY doc_id""",
    ),
    "p45_lm_bucket": (
        _p_lm_bucket,
        # same LM CTEs as p23 + rank-based ntile on the quantized ce
        f"""WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
           bg AS (
             SELECT doc_id,
                    unnest(list_transform(generate_series(2, len(toks)),
                                          i -> toks[i-1] || chr(31) || toks[i])) AS bg
             FROM base WHERE len(toks) >= 2
           ),
           bgc AS (SELECT bg, count(*) AS cb FROM bg GROUP BY bg),
           pfx AS (SELECT split_part(bg, chr(31), 1) AS p, count(*) AS cp
                   FROM bg GROUP BY 1),
           v AS (SELECT count(DISTINCT t) AS vs FROM (
                   SELECT unnest(toks) AS t FROM base)),
           sc AS (
             SELECT b.doc_id,
                    ln((c.cb + 1.0) / (p.cp + v.vs)) AS lp
             FROM bg b
             JOIN bgc c USING (bg)
             JOIN pfx p ON p.p = split_part(b.bg, chr(31), 1)
             CROSS JOIN v
           ),
           ce AS (SELECT doc_id, count(*) AS n_bigrams, -avg(lp) AS ce0
                  FROM sc GROUP BY doc_id)
           SELECT doc_id, n_bigrams, round(ce0, 5) AS cross_entropy,
                  CASE ntile(3) OVER (ORDER BY round(ce0, 6), doc_id)
                       WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket
           FROM ce""",
    ),
    "p21_dedup_against_index": (
        _p_dedup_against,
        # exact all-pairs Jaccard restricted to pairs touching the batch
        # (doc_id % 5 = 0): batch-vs-index dedup must equal the
        # full-corpus pair set restricted to the batch (VERDICT r6 #5)
        _ngram_jaccard_oracle() + " AND (id_a % 5 = 0 OR id_b % 5 = 0)",
    ),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style aggregation via SPARQL on sf0.001."""
    sparql, out_types, _ = _SPARQL_QUERIES["q03_tpch_q1"]
    return _sparql(sparql, **out_types)(spark, "/root/testdata/sf0.001")


def _with_pkg(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_pkg(spark)  # workers can import the package from any cwd
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (sparql, out_types, _) in _SPARQL_QUERIES.items():
        out[name] = _with_pkg(_sparql(sparql, **out_types))
    for name, (fn, _) in _PIPELINE_QUERIES.items():
        out[name] = _with_pkg(fn)
    for name, (fn, _) in _FORM_QUERIES.items():
        out[name] = _with_pkg(fn)
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: sql for name, (_, _, sql) in _SPARQL_QUERIES.items()}
    out.update({name: sql for name, (_, sql) in _PIPELINE_QUERIES.items() if sql is not None})
    out.update({name: sql for name, (_, sql) in _FORM_QUERIES.items() if sql is not None})
    return out
