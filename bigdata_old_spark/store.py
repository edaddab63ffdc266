"""TripleStore — the engine facade.

The Spark re-expression of the reference's AbstractTripleStore
(bigdata-rdf/.../store/AbstractTripleStore.java): holds the statements
DataFrame (triples or quads — g NULL = default graph) and exposes
query / load / closure / search entry points.  There is no journal, no
B+Tree, no lexicon: Parquet + shuffle + Catalyst replace the storage
engine wholesale (SURVEY.md §1, §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_old_spark.model import STATEMENTS_SCHEMA, statements_df_from_terms


#: volatile SPARQL builtins: ``_reserve_optimized`` must NOT pre-run
#: Catalyst on queries using them — the optimizer's ComputeCurrentTime
#: folds NOW() into a literal, and a cached pre-optimized plan would
#: serve that compile-time timestamp forever (ADVICE r10).  Textual
#: check is conservative: a false positive only skips plan re-serving.
import re as _re

_VOLATILE_RE = _re.compile(r"\b(NOW|RAND|UUID|STRUUID)\s*\(", _re.IGNORECASE)


def _star_survivors_from_plan(df: DataFrame, probes: dict) -> dict | None:
    """Read Catalyst's verdict on the star probe pass: which per-field
    first() aliases (``__v<star>_<pattern>_<field>``) survived column
    pruning in the OPTIMIZED plan.  Every field the rest of the query
    touches survives (it feeds a downstream expression); every field it
    never touches is pruned.  The result drives the second compile pass
    (compiler.compile_star FINAL form) — a wrong/missing entry can only
    widen the struct back to all 8 fields, never drop a used one,
    except via the sanity guard below, which refuses any per-pattern
    answer that lost the always-referenced ``kind`` marker (the
    existence filter references it, so a parse that misses it saw an
    incomplete plan).  Returns None when the plan cannot be inspected.
    """
    from bigdata_old_spark.model import TERM_FIELD_NAMES

    try:
        jplan = df._jdf.queryExecution().optimizedPlan()
    except Exception:
        return None
    text = None
    names: set[str] = set()
    try:
        text = jplan.toJSON()  # full-fidelity: no toString truncation
    except Exception:
        try:  # fallback: walk the tree, collect every node's output
            stack = [jplan]
            while stack:
                n = stack.pop()
                out = n.output()
                for k in range(out.size()):
                    names.add(out.apply(k).name())
                ch = n.children()
                for k in range(ch.size()):
                    stack.append(ch.apply(k))
        except Exception:
            return None

    def has(alias: str) -> bool:
        return (f'"{alias}"' in text) if text is not None else (alias in names)

    surv: dict = {}
    for sid, pats in probes.items():
        per = {}
        for i in pats:
            fields = frozenset(
                f for f in TERM_FIELD_NAMES if has(f"__v{sid}_{i}_{f}"))
            # the existence filter always references kind — if it is
            # missing we inspected an incomplete plan: full struct
            per[i] = fields if "kind" in fields else None
        surv[sid] = per
    return surv


def _reserve_optimized(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Re-wrap a compiled query over its OPTIMIZED logical plan.

    Every DataFrame ACTION re-runs Catalyst analysis+optimization from
    the raw logical plan; a SPARQL-compiled tree is thousands of nested
    projections, so each repeat `.count()`/`.collect()` paid 50-160 ms
    of single-threaded driver planning (r10 measurement; ~2× cheaper
    over the already-minimal optimized tree).  Optimizing once at
    compile time and serving the optimized plan is plan caching, not
    result caching — no data is materialized, every action still
    executes from the parquet inputs.  Falls back to the original
    DataFrame if the JVM surface is unavailable."""
    try:
        jopt = df._jdf.queryExecution().optimizedPlan()
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, jopt)
        return DataFrame(jdf, spark)
    except Exception:
        return df


class TripleStore:
    """Quad store over a flat statements DataFrame.

    ``union_default_graph`` mirrors the reference's quads-mode default
    (AbstractTripleStore: a query with no dataset runs against the RDF
    merge of ALL graphs, not just the unnamed one — the behavior the
    data-driven fixture corpus assumes).  Set False for strict SPARQL
    dataset semantics (default graph = unnamed triples only).
    """

    def __init__(
        self,
        spark: SparkSession,
        statements: DataFrame,
        union_default_graph: bool = True,
        has_named_graphs: bool | None = None,
    ):
        self.spark = spark
        self.statements = statements
        self.union_default_graph = union_default_graph
        self._has_ng = has_named_graphs
        #: durable named solution sets (reference ISolutionSetManager,
        #: SolutionSetManager.java) — INCLUDE %name resolves here when
        #: no WITH {…} AS %name named subquery is in scope.  Values are
        #: DataFrames with term-struct columns (one per variable).
        self.solution_sets: dict[str, DataFrame] = {}
        #: SIDs provenance mode (provenance.to_sids): reverse map
        #: (sid → reified s/p/o) consulted by the compiler for
        #: rdf:subject/rdf:predicate/rdf:object patterns
        self.sid_map: DataFrame | None = None
        #: compiled-plan cache: query text → DataFrame (the reference
        #: caches parsed/optimized ASTs per query string the same way —
        #: QueryCache/ASTContainer reuse).  DataFrames are immutable
        #: plan handles, and every mutation returns a NEW store with an
        #: empty cache, so entries can never serve stale data.  Volatile
        #: expressions (NOW/RAND/UUID) compile to Spark functions that
        #: re-evaluate per execution, so reuse is safe for them too.
        self._plan_cache: dict = {}
        #: load-time closure mode (reference DataLoader.ClosureEnum,
        #: store/DataLoader.java:76): "none" leaves closure manual;
        #: "batch" runs rdfs_closure after every SPARQL LOAD op (the
        #: single-op analog of Batch; inferred rows are stype-tagged)
        self.load_closure: str = "none"
        #: truth maintenance (reference BigdataSail.Options.TRUTH_
        #: MAINTENANCE, inf/TruthMaintenance.java:110): when True, the
        #: data-mutating UPDATE ops act on the EXPLICIT statements and
        #: the closure is re-derived per op (batch re-derivation — the
        #: reference's incremental assertion/retraction closure is an
        #: OLTP optimization of the same fixpoint); changesets then
        #: report inferred additions/removals and stype flips.  Triples
        #: mode only, like the reference (TM unsupported in quads mode).
        self.truth_maintenance: bool = False
        #: True when ``statements`` is a known rdfs_closure fixpoint —
        #: set by closure()/load-time closure and maintained by the TM
        #: update path; gates the incremental (delta-driven) TM closure
        #: (inference.incremental_closure requires a closed base).
        self.closed: bool = False
        #: "canonical" when ``statements`` came from
        #: closure(sameas="canonical") — queries then transparently
        #: rewrite alias IRI constants through the stored
        #: member↔canonical mapping and expand answer bindings across
        #: cliques (the two halves of the reference's virtual sameAs
        #: closure, inf/BackchainAccessPath.java).  None otherwise.
        self.sameas_mode: str | None = None
        # lazy per-store caches for canonical mode (derived from the
        # stored sameAs triples; statements are immutable per store)
        self._sameas_canon_cache = None  # (member, canon) DataFrame
        self._sameas_mem_cache = None    # (term, cls) DataFrame
        self._canon_lex_cache: dict = {}  # IRI lex → canon | None
        # member→canon driver dict when the map fits the broadcast
        # bound (canon_of_lex); False = probed and too big
        self._canon_dict_cache: dict | bool | None = None

    _merged_cache: DataFrame | None = None

    def merged_default_graph(self) -> DataFrame:
        """RDF merge of ALL graphs (union-default-graph scans): the
        (s,p,o)-dedup is computed ONCE per store and persisted, so a
        query with N triple patterns reuses one materialization instead
        of paying a dedup shuffle per pattern — the maintained-index
        analog of the reference's quads-mode access paths.  At 100 TB
        this is one bounded job amortized across every query on the
        store."""
        if self._merged_cache is None:
            keys = ["s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]
            if self._oltp_base_merged is not None and self._oltp_dirty:
                # the (s,p,o)-dedup groups BY p, so it distributes over
                # the predicate partitioning: clean predicates' merged
                # rows equal the base's (already persisted) merged rows,
                # and only the dirty predicates' rows re-dedup — a
                # mutation costs the touched partitions, never a
                # corpus-wide re-merge per store swap
                dirty = sorted(self._oltp_dirty)
                dm = (self.statements.where(F.col("p").isin(*dirty))
                      .dropDuplicates(keys).persist())
                # persist ONLY the dirty part: the clean side reads the
                # base's already-persisted merged blocks (no double
                # caching), the union stays lazy
                self._merged_cache = (
                    self._oltp_base_merged.where(~F.col("p").isin(*dirty))
                    .unionByName(dm))
            else:
                self._merged_cache = self.statements.dropDuplicates(
                    keys).persist()
        return self._merged_cache

    @property
    def has_named_graphs(self) -> bool:
        """Lazily probed once per store; drives the union-default-graph
        scan (a triples-only store never pays the merge dedup)."""
        if self._has_ng is None:
            self._has_ng = (
                self.statements.where(F.col("g").isNotNull()).limit(1).count() > 0
            )
        return self._has_ng

    def with_statements(
        self, statements: DataFrame, has_named_graphs: bool | None = None
    ) -> "TripleStore":
        """Derived store carrying this store's semantics flags."""
        st = TripleStore(
            self.spark,
            statements,
            union_default_graph=self.union_default_graph,
            has_named_graphs=has_named_graphs,
        )
        st.solution_sets = dict(self.solution_sets)
        st.sid_map = self.sid_map
        st.load_closure = self.load_closure
        st.truth_maintenance = self.truth_maintenance
        st.sameas_mode = self.sameas_mode
        return st

    def to_sids(self) -> "TripleStore":
        """Enable the provenance mode: unify reification bundles into
        statement identifiers (provenance.to_sids)."""
        from bigdata_old_spark.provenance import to_sids

        st, _ = to_sids(self)
        return st

    def put_solution_set(self, name: str, df: DataFrame) -> None:
        """Store a durable named solution set for ``INCLUDE %name``
        (reference SolutionSetManager.putSolutions).  ``df`` columns are
        term structs, one per variable."""
        self.solution_sets[name.lstrip("%")] = df

    # -- constructors --------------------------------------------------------
    @staticmethod
    def from_parquet(spark: SparkSession, path: str) -> "TripleStore":
        st = TripleStore(spark, spark.read.schema(STATEMENTS_SCHEMA).parquet(path))
        return TripleStore._apply_flags_sidecar(spark, path, st)

    @staticmethod
    def from_parquet_partitioned(spark: SparkSession, path: str) -> "TripleStore":
        """Read a store written with partition_by_predicate=True —
        schema inference picks up `p` as a partition column, so
        bound-predicate scans prune to single directories."""
        df = spark.read.parquet(path)
        st = TripleStore(spark, df.select(*[f.name for f in STATEMENTS_SCHEMA.fields]))
        return TripleStore._apply_flags_sidecar(spark, path, st)

    @staticmethod
    def from_rows(
        spark: SparkSession, rows: list[tuple], closure: str = "none"
    ) -> "TripleStore":
        """rows: (g, s, p, o[, stype]) with o a Term or plain Python value.
        ``closure="batch"`` runs the RDFS(+OWL) forward closure right
        after load — the DataLoader ClosureEnum analog
        (store/DataLoader.java:76); inferred rows are stype-tagged."""
        has_ng = any(r[0] is not None for r in rows)
        st = TripleStore(
            spark, statements_df_from_terms(rows, spark), has_named_graphs=has_ng
        )
        if len(rows) <= 200_000:
            # the rows are already on the driver: the planner stats the
            # first query needs (cardinalities + the exact functionality
            # bit) cost ZERO jobs here, instead of a full-scan
            # aggregation job against a DataFrame we just shipped OUT of
            # this process.  Same tuple convention as _stats_by_p.
            from collections import defaultdict

            from bigdata_old_spark.model import Term as _Term

            per: dict = defaultdict(lambda: [0, set(), set()])
            for r in rows:
                o = _Term.from_python(r[3])
                e = per[r[2]]
                e[0] += 1
                e[1].add(r[1])
                if o.lex is not None:
                    e[2].add(o.lex)
            by_p = {
                p: (e[0], max(len(e[1]), 1), max(len(e[2]), 1),
                    1 if e[0] == len(e[1]) else 2)
                for p, e in per.items()
            }
            st._stats = {"total": sum(v[0] for v in by_p.values()),
                         "by_p": by_p}
        return _apply_load_closure(st, closure)

    @staticmethod
    def from_tpch_dir(spark: SparkSession, sf_dir: str, tables: list[str] | None = None, cache: bool = True) -> "TripleStore":
        """Triplified view of the driver's TPC-H-ish parquet tables."""
        from bigdata_old_spark.mapping import triplify_dir

        df = triplify_dir(spark, sf_dir, tables)
        if cache:
            df = df.persist()
        # triplify emits g=NULL throughout — no named graphs, no merge dedup
        return TripleStore(spark, df, has_named_graphs=False)

    @staticmethod
    def from_turtle(
        spark: SparkSession, text: str, graph: str | None = None, closure: str = "none"
    ) -> "TripleStore":
        from bigdata_old_spark.rio import parse_turtle

        rows = [(graph, s, p, o) for s, p, o in parse_turtle(text)]
        return TripleStore.from_rows(spark, rows, closure=closure)

    @staticmethod
    def from_trig(spark: SparkSession, text: str, closure: str = "none") -> "TripleStore":
        from bigdata_old_spark.rio import parse_trig

        return TripleStore.from_rows(spark, parse_trig(text), closure=closure)

    @staticmethod
    def from_rdfxml(
        spark: SparkSession, text: str, graph: str | None = None, base: str = "",
        closure: str = "none",
    ) -> "TripleStore":
        from bigdata_old_spark.rio import parse_rdfxml

        rows = [(graph, s, p, o) for s, p, o in parse_rdfxml(text, base)]
        return TripleStore.from_rows(spark, rows, closure=closure)

    # -- statistics (lazy, cached) ----------------------------------------------
    _stats = None
    _stats_dirty: set | None = None
    #: TM schema snapshot carried across incremental updates
    #: (update._apply_tm) — never copied by with_statements; only the
    #: TM path sets it on the store it returns.
    _tm_snap = None

    def stats(self) -> dict:
        """Cardinality statistics for join ordering: total triples and,
        per predicate, (count, ndv(subject), ndv(object)).  The Spark
        replacement for the reference's rangeCount-based estimates
        (AccessPath.rangeCount, ASTRangeCountOptimizer) — one
        aggregation pass, cached; ~#predicates rows on the driver.

        Mutations carry the cache forward with a DIRTY-predicate set
        (_carry_stats_from): the next stats() call re-aggregates only
        the touched predicates' pruned partitions instead of the whole
        corpus — without this, a server doing small UPDATEs makes every
        subsequent read pay two corpus aggregations per store swap.

        Serialized under a per-store lock: concurrent first queries
        (server request pools, the bench warm-up pool) used to EACH run
        the full aggregation job — N identical corpus scans for one
        memoized result."""
        if self._stats is not None and not self._stats_dirty:
            return self._stats  # fast path, no lock
        if self._stats_lock is None:  # pre-__init__ class default
            import threading

            # benign race: worst case two locks created, one discarded
            self.__dict__.setdefault("_stats_lock", threading.Lock())
        with self._stats_lock:
            if self._stats is None:
                by_p = self._stats_by_p(None)
                self._stats = {"total": sum(v[0] for v in by_p.values()), "by_p": by_p}
            elif self._stats_dirty:
                upd = self._stats_by_p(sorted(self._stats_dirty))
                by_p = self._stats["by_p"]
                for p in self._stats_dirty:
                    by_p.pop(p, None)
                by_p.update(upd)
                self._stats = {"total": sum(v[0] for v in by_p.values()), "by_p": by_p}
                self._stats_dirty = set()
        return self._stats

    _stats_lock = None

    def _stats_by_p(self, preds: list | None) -> dict:
        """(count, ndv(s), ndv(o), max-per-(p,s)) per predicate — over
        all predicates (preds=None) or a pruned subset."""
        from pyspark.sql import functions as F

        df = self.statements
        if preds is not None:
            if not preds:
                return {}
            df = df.where(F.col("p").isin(*preds))
        # Small-store fast path: a bounded limit-probe collect (one job,
        # no shuffle, LocalLimit early-exits on big stores) and exact
        # driver-side aggregation.  The planner's one-time stats build
        # was a full groupBy job even for a 10-row in-memory store —
        # ~1.4 s of shuffle/scheduling floor paid by EVERY fresh tiny
        # store's first query (the dominant cost of the test suite and
        # of small OLTP stores).  Above the cap the distributed
        # aggregation below runs unchanged.
        #
        # File-backed stores skip even the probe when the on-disk
        # footprint alone proves they are big — inputFiles() and
        # getsize are driver-side metadata, no job (the serving store's
        # cold stats paid ~2 s collecting a 200k-row probe it then
        # discarded).
        cap = 200_000
        probe = True
        try:
            files = df.inputFiles()
            if files:
                sample = files[:64]
                sz = sum(
                    os.path.getsize(f[5:] if f.startswith("file:") else f)
                    for f in sample
                ) * (len(files) / len(sample))
                if sz > 32 * 1024 * 1024:  # >32 MB compressed on disk
                    probe = False
        except Exception:
            pass
        pdf = None
        if probe:
            try:
                pdf = df.select("p", "s", "o_lex").limit(cap + 1).toPandas()
            except Exception:
                pdf = None
        if pdf is not None and len(pdf) <= cap:
            out = {}
            for p, grp in pdf.groupby("p", sort=False):
                n = len(grp)
                ns = grp["s"].nunique()
                no = grp["o_lex"].nunique()  # pandas nunique drops NaN
                out[p] = (n, max(ns, 1), max(int(no), 1),
                          1 if n == ns else 2)
            return out
        # ONE full scan (was two concurrent ones, r10): exact
        # countDistinct(s) answers BOTH the subject-cardinality estimate
        # and the functionality test the star planner needs — a
        # predicate is strictly functional (max statements per (p,s)
        # == 1) iff its statement count equals its exact distinct
        # subject count.  Exact, never guessed from a sketch: a wrong
        # "functional" would silently drop multi-value solutions.
        rows = (
            df.groupBy("p")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("s").alias("ns"),
                F.approx_count_distinct("o_lex").alias("no"),
            )
            .collect()
        )
        return {
            r["p"]: (r["n"], max(r["ns"], 1), max(r["no"], 1),
                     1 if r["n"] == r["ns"] else 2)
            for r in rows
        }

    #: after this many CHAINED mutations the statements plan compacts
    #: (localCheckpoint) — each mutation layers a (small, checkpointed)
    #: union/anti-join onto the read plan, and an unbounded chain makes
    #: reads linear in mutation count.  This is the OLTP analog of the
    #: reference's journal compaction; a production deployment would
    #: periodically rewrite the serving layout instead (write_bucketed).
    MUTATION_COMPACT_DEPTH = 8
    _mut_depth = 0

    #: pre-mutation-chain statements plan + the predicates any chain
    #: layer touched.  Constant-predicate scans of UNTOUCHED predicates
    #: compile against the BASE plan (scan_source), so a store that was
    #: bucketed keeps its zero-Exchange star joins and aggregations
    #: across writer swaps — without this, the union-with-delta layer
    #: broke every query's co-location and each reader mix after a swap
    #: re-paid a full shuffle per query (measured 4×: 17.5 s vs 4.1 s
    #: mix over the sf0.1 bench store).  The write-side analog of the
    #: reference's isolated journal writes against immutable index
    #: segments.
    _oltp_base: DataFrame | None = None
    _oltp_dirty: set | None = None
    #: above this many distinct touched predicates the base bookkeeping
    #: stops paying (isin() of hundreds of literals defeats pruning)
    OLTP_DIRTY_PRED_CAP = 64

    #: the BASE's merged default-graph view (quads union scans) — set at
    #: chain start from the pristine store's cache so merged_default_graph
    #: can rebuild per swap as clean-from-base ∪ dedup(dirty rows)
    #: instead of a corpus-wide re-merge
    _oltp_base_merged: DataFrame | None = None

    def _carry_oltp_base(self, src: "TripleStore", preds) -> None:
        """Track the mutation chain's base plan and touched-predicate
        set.  ``preds=None`` = unknown touch set — the base is dropped
        and every scan reads the layered statements plan."""
        if preds is None:
            self._oltp_base = None
            self._oltp_dirty = None
            self._oltp_base_merged = None
            return
        base = src._oltp_base if src._oltp_base is not None else src.statements
        dirty = set(src._oltp_dirty or ()) | set(preds)
        if len(dirty) > self.OLTP_DIRTY_PRED_CAP:
            self._oltp_base = None
            self._oltp_dirty = None
            self._oltp_base_merged = None
            return
        self._oltp_base = base
        self._oltp_dirty = dirty
        # the merged view that corresponds to _oltp_base: the pristine
        # store's cache at chain start, kept verbatim thereafter
        self._oltp_base_merged = (
            src._merged_cache if src._oltp_base is None
            else src._oltp_base_merged)
        # carry every compiled plan whose predicate footprint is
        # disjoint from THIS mutation's touched set: its scans read
        # rows this mutation did not change, so the cached DataFrame
        # (and its already-computed shuffle stages) stays exact on the
        # new store — readers keep warm latencies across writer swaps
        ps = set(preds)
        # list() snapshots the source cache in one C-level pass — server
        # reader threads may still be inserting into it while the writer
        # thread builds the new store (a bare dict comprehension over
        # .items() can raise "dict changed size during iteration")
        self._plan_cache = {
            k: v for k, v in list(src._plan_cache.items())
            if v[1] is not None and v[1].isdisjoint(ps)
        }

    def scan_source(self, preds=None) -> DataFrame:
        """The DataFrame a constant-predicate access path should scan:
        the pre-mutation BASE plan when every requested predicate is
        untouched by the mutation chain (their rows are identical, and
        the base keeps its bucketing/pruning plan shape), else the
        layered statements.  ``preds`` is a predicate IRI, a list of
        them, or None (variable predicate / unknown → statements)."""
        if preds is None or self._oltp_base is None:
            return self.statements
        if isinstance(preds, str):
            preds = [preds]
        if all(p not in self._oltp_dirty for p in preds):
            return self._oltp_base
        return self.statements

    def _bump_mutation_depth(self, src: "TripleStore") -> "TripleStore":
        self._mut_depth = getattr(src, "_mut_depth", 0) + 1
        if self._mut_depth >= self.MUTATION_COMPACT_DEPTH:
            if self._oltp_base is not None and self._oltp_dirty:
                # compact ONLY the touched predicates' rows: the clean
                # remainder re-reads the base plan (pruned NOT-IN on the
                # partition column), so the checkpoint is bounded by the
                # dirty partitions, not the corpus
                dirty = sorted(self._oltp_dirty)
                delta = self.statements.where(
                    F.col("p").isin(*dirty)).localCheckpoint(eager=True)
                self.statements = self._oltp_base.where(
                    ~F.col("p").isin(*dirty)).unionByName(delta)
            else:
                self.statements = self.statements.localCheckpoint(eager=True)
            self._mut_depth = 0
        return self

    def _carry_stats_from(self, src: "TripleStore", dirty_preds) -> None:
        """Carry the source store's cached stats across a mutation whose
        touched-predicate set is known (driver-side, from the UPDATE
        op's ground quads / constant-predicate templates).  ``None`` =
        unknown touch set — no carry, next stats() recomputes fully."""
        if src._stats is None or dirty_preds is None:
            return
        self._stats = {"total": src._stats["total"],
                       "by_p": dict(src._stats["by_p"])}
        self._stats_dirty = set(src._stats_dirty or ()) | set(dirty_preds)

    # -- full-text index (lazy, cached) ----------------------------------------
    _text_index = None

    def text_index(self):
        """Inverted index over string literals (search.build_text_index),
        built on first use and persisted — the analog of the reference's
        maintained FullTextIndex."""
        if self._text_index is None:
            from bigdata_old_spark.search import build_text_index

            # persist=True caches the index df; corpus stats (n_docs)
            # are computed once here, so queries never run a pre-count
            self._text_index = build_text_index(self.statements, persist=True)
        return self._text_index

    # -- query ---------------------------------------------------------------
    def query(
        self,
        sparql: str,
        describe_mode: str | None = None,
        bindings: dict | None = None,
        dataset=None,
        expand_sameas: bool | None = None,
    ) -> DataFrame:
        """SPARQL string → result DataFrame (term-struct columns for
        SELECT; s/p/o term structs for CONSTRUCT/DESCRIBE; one boolean
        row for ASK).  ``describe_mode`` picks the DESCRIBE algorithm
        (ForwardOneStep | CBD | SymmetricOneStep | SCBD — the
        reference's DescribeModeEnum; default SymmetricOneStep, matching
        QueryHints.DEFAULT_DESCRIBE_MODE).

        ``bindings`` pre-binds variables before evaluation — the Sesame
        Query.setBinding surface the reference exposes (exercised by its
        TestSetBinding/TestTicket275): {var_name: Term or plain Python
        str/int/float/bool}.  Bindings seed the pipeline start exactly
        like a VALUES block, so filters and patterns see them bound.

        Over a ``sameas_mode == "canonical"`` store the query is
        TRANSPARENT to the virtual sameAs closure: each triple-pattern
        scan canonicalizes its alias IRI constants and fans its variable
        bindings back out across the cliques, so FILTERs, VALUES, joins
        and aggregates all see materialized-equivalent bindings with
        exact bag semantics — the reference's query-time backchain
        (inf/BackchainAccessPath.java), per access path.  Pass
        ``expand_sameas=False`` for the raw canonical bindings."""
        from bigdata_old_spark import algebra as A
        from bigdata_old_spark.compiler import QueryCompiler
        from bigdata_old_spark.parser import parse_query

        if expand_sameas is None:
            expand_sameas = self.sameas_mode == "canonical"
        key = (
            sparql,
            describe_mode,
            None if not bindings else tuple(sorted((k, repr(v)) for k, v in bindings.items())),
            None if dataset is None else repr(dataset),
            expand_sameas,
        )
        cached = self._plan_cache.get(key)
        if cached is not None:
            return cached[0]
        q = parse_query(sparql)
        if dataset is not None:
            # SPARQL 1.1 Protocol: default-graph-uri/named-graph-uri in
            # the request take precedence over the query's own FROM
            # clauses (BigdataRDFContext.java:183-201)
            q.dataset = dataset
        if describe_mode is not None and isinstance(q, A.DescribeQuery):
            q.mode = describe_mode
        if bindings:
            from bigdata_old_spark.model import Term

            names = [n.lstrip("?$") for n in bindings]
            row = [
                v if isinstance(v, Term) else Term.from_python(v)
                for v in bindings.values()
            ]
            vp = A.ValuesPat(names, [row])
            if q.values is None:
                q.values = vp  # seeds the pipeline start (incoming bindings)
            elif q.pattern is not None:
                q.pattern = A.Join(vp, q.pattern)
            else:  # DESCRIBE <term> with no WHERE — bindings vacuous
                pass
        comp = QueryCompiler(self, backchain=expand_sameas)
        df = comp.compile_query(q)
        if comp.star_probes and not comp.eager_compiled:
            # two-pass star-form selection: pass 1 (above) compiled each
            # functional star member as per-field firsts; Catalyst's
            # pruning of those aliases is an exact record of which term
            # fields the rest of the query touches.  Pass 2 recompiles
            # with ONE narrow-struct first() per member — same results
            # (both forms are exact), minimal aggregation state AND
            # minimal scan width.  Skipped when compilation ran eager
            # work (paths/named sets/sampling/DESCRIBE/SERVICE) so jobs
            # are never executed twice.
            surv = _star_survivors_from_plan(df, comp.star_probes)
            if surv is not None:
                comp2 = QueryCompiler(
                    self, backchain=expand_sameas, star_survivors=surv)
                df = comp2.compile_query(q)
                comp = comp2
        if _VOLATILE_RE.search(sparql) is None:
            df = _reserve_optimized(self.spark, df)
        if len(self._plan_cache) >= 256:  # bounded; oldest-first evict
            self._plan_cache.pop(next(iter(self._plan_cache)))
        # entry = (df, carried-predicate set | None).  A non-None set
        # means the plan depends ONLY on those predicates' rows, so
        # _carry_oltp_base can keep the entry (the SAME DataFrame, with
        # its reusable shuffle stages) across any mutation that touches
        # disjoint predicates — the reason a writer swap doesn't force
        # every reader query back to a cold plan.
        self._plan_cache[key] = (
            df, frozenset(comp.scan_preds) if comp.cache_carry_safe else None)
        return df

    def serialize(self, sparql: str, format: str = "json", dataset=None) -> str:
        """Run a query and serialize the result for the SPARQL protocol
        (format: json | xml | csv | tsv | ntriples | turtle, or a MIME
        type — serializers.MIME_FORMATS)."""
        from bigdata_old_spark import serializers

        return serializers.serialize(self.query(sparql, dataset=dataset), format)

    def query_algebra(self, q) -> DataFrame:
        from bigdata_old_spark.compiler import QueryCompiler

        return QueryCompiler(self).compile_query(q)

    def explain(self, sparql: str) -> str:
        """The EXPLAIN surface (reference QueryServlet ?explain)."""
        df = self.query(sparql)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    # -- mutation (SPARQL UPDATE analog — batch Parquet rewrite) --------------
    def update(self, sparql_update: str, change_log=None, dataset=None) -> "TripleStore":
        """Execute a SPARQL UPDATE request; returns the new store.
        ``change_log`` (changesets.ChangeLog) receives the per-op
        added/removed statement deltas — the IChangeLog analog.
        ``dataset`` is the Protocol using-graph-uri override."""
        from bigdata_old_spark.update import execute_update

        return execute_update(self, sparql_update, change_log=change_log, dataset=dataset)

    def closure(self, sameas: str = "materialize") -> "TripleStore":
        """RDFS forward closure (inference.rdfs_closure).

        ``sameas="canonical"`` stores per-clique canonical ids + a
        linear member↔canonical mapping instead of the O(clique²)
        materialized pair closure — the crawl-scale shape.  The
        returned store is QUERY-TRANSPARENT (sameas_mode flag): query()
        backchains alias constants and fans bindings back out per
        access path, so results match the materialized closure; use
        inference.expand_sameas only to materialize a bounded slice."""
        from bigdata_old_spark.inference import (
            canonical_closure_with_map,
            rdfs_closure,
        )

        if sameas == "canonical":
            closed, mapping = canonical_closure_with_map(self.statements)
            st = self.with_statements(closed)
            st.sameas_mode = "canonical" if mapping is not None else None
            # no safe clique → the closure fell back to the full
            # materialized fixpoint, which the TM paths may build on
            st.closed = mapping is None
            # seed the backchain cache — the first query then pays no
            # CC recompute of the mapping it was closed with
            st._sameas_canon_cache = mapping
            return st
        st = self.with_statements(rdfs_closure(self.statements, sameas=sameas))
        # the TM incremental paths assume the MATERIALIZED fixpoint
        st.closed = sameas == "materialize"
        return st

    # -- canonical sameAs mode: per-store lazy caches -------------------------
    def _sameas_canon_map(self):
        """(member, canon) over the stored sameAs triples, computed once
        per store (inference.sameas_canonical_map — safe instance
        cliques only, so predicate/schema terms never rewrite)."""
        if self._sameas_canon_cache is None:
            from bigdata_old_spark.inference import sameas_canonical_map

            self._sameas_canon_cache = sameas_canonical_map(
                self.statements).localCheckpoint(eager=True)
        return self._sameas_canon_cache

    #: broadcast the clique-membership map into the per-pattern
    #: backchain joins below this row count (~100 MB of 2-string rows);
    #: a crawl-scale map above it falls back to shuffle joins, which is
    #: the correct trade at that size
    SAMEAS_MEM_BROADCAST_ROWS = 1_000_000

    def _sameas_mem(self):
        """(term, cls) membership of the SAFE cliques only — derived from
        the stored member→canonical mapping, computed once per store and
        broadcast-hinted when small so the per-pattern backchain
        expansion joins never shuffle the matched rows.

        Deliberately NOT _sameas_cliques(statements): UNSAFE
        (schema-positioned) cliques keep the exact materialized
        RuleOwlSameAs replication in a canonical closure, so their rows
        are already fanned out in the data — expanding them again at the
        access path would duplicate SELECT rows and break the exact bag
        semantics (COUNT/SUM) the backchain guarantees.  The safe map is
        also what _canon_pattern_consts rewrites constants through, so
        both backchain halves see the same clique set."""
        if self._sameas_mem_cache is None:
            cm = self._sameas_canon_map()
            mem = (
                cm.select(F.col("member").alias("term"), F.col("canon").alias("cls"))
                .unionByName(cm.select(F.col("canon").alias("term"),
                                       F.col("canon").alias("cls")))
                .dropDuplicates()
                .localCheckpoint(eager=True)
            )
            if mem.count() <= self.SAMEAS_MEM_BROADCAST_ROWS:
                mem = F.broadcast(mem)
            self._sameas_mem_cache = mem
        return self._sameas_mem_cache

    def canon_of_lex(self, lex: str) -> str | None:
        """Canonical id for an IRI that is a mapped (safe-clique) member,
        else None — memoized per store.  Below SAMEAS_MEM_BROADCAST_ROWS
        the whole linear mapping is collected ONCE into a driver dict
        (same ≤1M-row memory bound as the broadcast hint), so a query
        with many distinct alias constants pays one job total instead of
        one filtered take(1) per constant; above the threshold each miss
        stays a filtered take(1) — never a driver copy of a crawl-scale
        map."""
        if lex in self._canon_lex_cache:
            return self._canon_lex_cache[lex]
        if self._canon_dict_cache is None:
            cm = self._sameas_canon_map()
            head = cm.limit(self.SAMEAS_MEM_BROADCAST_ROWS + 1).collect()
            if len(head) <= self.SAMEAS_MEM_BROADCAST_ROWS:
                self._canon_dict_cache = {r["member"]: r["canon"] for r in head}
            else:
                self._canon_dict_cache = False  # too big — point lookups
        if self._canon_dict_cache is not False:
            self._canon_lex_cache[lex] = self._canon_dict_cache.get(lex)
        else:
            rows = self._sameas_canon_map().where(
                F.col("member") == lex).take(1)
            self._canon_lex_cache[lex] = rows[0]["canon"] if rows else None
        return self._canon_lex_cache[lex]

    #: prune the add()/InsertData dedup probe to the incoming rows'
    #: predicate partitions when they number at most this many (an
    #: isin() of hundreds of literals stops helping the pruner)
    ADD_PROBE_PRED_CAP = 64

    def add(self, other: DataFrame) -> "TripleStore":
        """Set-semantics insert as a DELTA overlay: the incoming rows
        dedup internally, anti-join ONCE (eagerly, predicate-pruned)
        against the current statements, and union in WITHOUT a
        corpus-wide dropDuplicates.  The old unionByName+dropDuplicates
        stacked a full-corpus dedup aggregate into EVERY subsequent
        read plan — after a handful of server mutations, reads
        re-evaluated the whole mutation chain per query (r10: a
        1-writer QMpH run wedged the readers exactly that way).  Here
        the write pays one bounded job (probe pruned to the touched
        predicates' partitions) and reads pay a plain union with a
        small checkpointed delta."""
        from bigdata_old_spark.update import _canonize_delta

        cand = _canonize_delta(
            self, other.select(*self.statements.columns)).dropDuplicates()
        preds = [r["p"] for r in cand.select("p").distinct().collect()]
        if not preds:
            return self.with_statements(self.statements)
        probe = self.statements
        if len(preds) <= self.ADD_PROBE_PRED_CAP:
            probe = probe.where(F.col("p").isin(*preds))
        cond = None
        for c in self.statements.columns:
            e = F.col(f"__n.{c}").eqNullSafe(F.col(f"__b.{c}"))
            cond = e if cond is None else (cond & e)
        new = (
            cand.alias("__n")
            .join(probe.alias("__b"), cond, "left_anti")
            .localCheckpoint(eager=True)
        )
        st = self.with_statements(self.statements.unionByName(new))
        st._carry_stats_from(self, preds)
        st._carry_oltp_base(self, preds)
        return st._bump_mutation_depth(self)

    def remove(self, other: DataFrame) -> "TripleStore":
        # null-SAFE key equality: joining on bare column names uses
        # SQL EqualTo, under which NULL != NULL — a statement with any
        # NULL field (every literal's o_lang, g of the default graph…)
        # would never match its own removal row
        left = self.statements
        if self.sameas_mode == "canonical":
            # canonical store: deleting any ALIAS form retracts the
            # canonical FACT (the backchain serves the replicas from it)
            from bigdata_old_spark.model import STYPE_EXPLICIT
            from bigdata_old_spark.update import _canonize_delta

            src = other
            if "stype" not in src.columns:
                src = src.withColumn(
                    "stype", F.lit(STYPE_EXPLICIT).cast("tinyint"))
            other = _canonize_delta(self, src.select(*self.statements.columns))
        right = other.select(
            *[c for c in self.statements.columns if c != "stype"]
        ).dropDuplicates().alias("__rm")
        left = left.alias("__st")
        cond = None
        for c in right.columns:
            e = F.col(f"__st.{c}").eqNullSafe(F.col(f"__rm.{c}"))
            cond = e if cond is None else (cond & e)
        st = self.with_statements(
            left.join(right, cond, "left_anti"),
            has_named_graphs=self._has_ng and None,
        )
        # the victim rows' predicates (request-bound) are the only
        # dirty ones — one small distinct job keeps both the stats
        # cache and the base-plan scan source across the removal
        preds = [r["p"] for r in right.select("p").distinct().collect()]
        if self._stats is not None:
            st._carry_stats_from(self, preds)
        st._carry_oltp_base(self, preds)
        return st._bump_mutation_depth(self)

    def persist(self) -> "TripleStore":
        self.statements = self.statements.persist()
        return self

    def write_parquet(self, path: str, partition_by_predicate: bool = False) -> None:
        """Canonical store sink.  ``partition_by_predicate`` is the
        Parquet analog of the reference's POS index (predicate-major
        key order) — partition pruning then serves bound-predicate
        scans without touching other predicates' files."""
        w = self.statements.write.mode("overwrite")
        if partition_by_predicate:
            w = w.partitionBy("p")
        w.parquet(path)
        self._write_flags_sidecar(path)

    def _flags_json(self) -> str:
        import json

        return json.dumps({"union_default_graph": self.union_default_graph,
                           "sameas_mode": self.sameas_mode})

    def _write_flags_sidecar(self, path: str) -> None:
        """Persist the store's semantics flags next to the data (an
        underscore-prefixed subdir, invisible to the parquet reader —
        the same Spark-text sidecar shape the IVF index uses for its
        centroids), so from_parquet/from_bucketed reopen a canonical-
        mode store as canonical without the caller re-flagging it.

        Written through the Hadoop FileSystem API directly (works on
        any Spark-supported FS), NOT as a 1-row Spark text job: the
        old ``createDataFrame([...]).write.text`` spun up a Python
        worker + daemon just to serialize one literal row — measured
        ~10 s cold inside every bulk load (r10 stage profile)."""
        from bigdata_old_spark.fsio import write_text_dir

        write_text_dir(self.spark, path + "/_bdos_flags",
                       self._flags_json() + "\n")

    def _write_flags_tblproperties(self, table: str) -> None:
        """Persist the semantics flags IN the table definition
        (TBLPROPERTIES), so a MANAGED table (write_bucketed with no
        path — no directory to drop a sidecar into) round-trips
        sameas_mode/union_default_graph through from_table.  External
        tables get both (the sidecar survives catalog loss; the
        property serves same-catalog reopens)."""
        flags = self._flags_json().replace("'", "''")
        self.spark.sql(
            f"ALTER TABLE `{table}` SET TBLPROPERTIES ('bdos.flags' = '{flags}')")

    @staticmethod
    def _apply_flags_tblproperties(spark: SparkSession, table: str,
                                   st: "TripleStore") -> "TripleStore":
        import json

        try:
            rows = spark.sql(f"SHOW TBLPROPERTIES `{table}`").collect()
            props = {r["key"]: r["value"] for r in rows}
            flags = json.loads(props["bdos.flags"])
        except Exception:
            return st  # pre-r10 table or no flags property
        st.union_default_graph = flags.get(
            "union_default_graph", st.union_default_graph)
        st.sameas_mode = flags.get("sameas_mode")
        return st

    @staticmethod
    def _apply_flags_sidecar(spark: SparkSession, path: str, st: "TripleStore") -> "TripleStore":
        """Read the flags sidecar through the Hadoop FS API — one
        driver-side open, no Spark job per store-open.  Accepts both
        the new direct layout and dirs written by the old 1-row Spark
        text job (part-* files)."""
        import json

        from bigdata_old_spark.fsio import read_text_dir

        try:
            flags = json.loads(read_text_dir(spark, path + "/_bdos_flags"))
        except Exception:
            return st  # no sidecar (pre-r9 store or bare parquet)
        st.union_default_graph = flags.get(
            "union_default_graph", st.union_default_graph)
        st.sameas_mode = flags.get("sameas_mode")
        return st

    def write_bucketed(self, table: str, buckets: int = 32, path: str | None = None,
                       partition_graph: bool = False) -> None:
        """Cluster-scale serving layout: partitioned by predicate (POS
        pruning, as write_parquet) AND bucketed+sorted by subject.  Every
        BGP subject join then reads co-bucketed files and sort-merge
        joins WITHOUT an exchange — the Spark analog of the reference
        keeping SPO order clustered (SPOKeyOrder.java): star patterns
        over N predicates cost N co-located scans, zero shuffles.
        Size ``buckets`` so one bucket of the largest predicate fits an
        executor's memory at target scale.

        With ``path`` the table is EXTERNAL: the bucketed files land at
        a stable location that any later session can re-register via
        :meth:`register_bucketed` — bucket metadata lives in the table
        definition, not the files, so path+spec is all a session needs.

        The pre-repartition on ``s`` uses the same murmur3-pmod hash as
        the bucket assignment, so each write task holds exactly one
        bucket and emits one file per predicate partition — without it,
        every input task writes a file per (partition × bucket), an
        O(tasks · partitions · buckets) small-file explosion.

        ``partition_graph`` is the QUADS-native layout (the reference's
        quads key orders add the context to every index,
        SPOKeyOrder.java quad orders): the graph joins the partition
        key — (p, g) directories — so ``GRAPH <const>`` prunes to
        directories exactly like a bound predicate does.  Null-graph
        rows land in the Hive default partition and read back as NULL."""
        w = (
            self.statements.repartition(buckets, F.col("s"))
            .write.mode("overwrite")
            .partitionBy(*(["p", "g"] if partition_graph else ["p"]))
            .bucketBy(buckets, "s")
            .sortBy("s")
            .format("parquet")
        )
        if path is not None:
            w = w.option("path", path)
        w.saveAsTable(table)
        self._write_flags_tblproperties(table)
        if path is not None:
            # flags sidecar (see _write_flags_sidecar): underscore dir,
            # ignored by both the parquet reader and RECOVER PARTITIONS
            self._write_flags_sidecar(path)

    @staticmethod
    def register_bucketed(spark: SparkSession, table: str, path: str, buckets: int = 32,
                          partition_graph: bool = False) -> None:
        """Register pre-written bucketed files as an external table in
        THIS session's catalog.  No Hive metastore required: the DDL
        (CLUSTERED BY spec + LOCATION) recreates the bucket metadata in
        the in-memory catalog, and RECOVER PARTITIONS discovers the
        partition directories — so a fresh process (e.g. the driver's
        vanilla session) gets shuffle-free subject joins from files
        written by an earlier one.  ``partition_graph`` must match the
        write (quads layout: PARTITIONED BY (p, g))."""
        if spark.catalog.tableExists(table):
            return
        parts = ["p", "g"] if partition_graph else ["p"]
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in STATEMENTS_SCHEMA.fields
            if f.name not in parts
        )
        part_cols = ", ".join(f"`{c}` STRING" for c in parts)
        spark.sql(
            f"CREATE TABLE `{table}` ({cols}, {part_cols}) USING PARQUET "
            f"OPTIONS (path '{path}') PARTITIONED BY ({', '.join(parts)}) "
            f"CLUSTERED BY (s) SORTED BY (s) INTO {buckets} BUCKETS"
        )
        spark.sql(f"ALTER TABLE `{table}` RECOVER PARTITIONS")

    @staticmethod
    def from_bucketed(
        spark: SparkSession,
        table: str,
        path: str,
        buckets: int = 32,
        has_named_graphs: bool | None = None,
        partition_graph: bool = False,
    ) -> "TripleStore":
        """Open a bucketed store written by ``write_bucketed(path=...)``,
        registering it in this session's catalog if needed.  Pass
        ``has_named_graphs=False`` for triples-only data to skip the
        one-time graph probe."""
        TripleStore.register_bucketed(spark, table, path, buckets,
                                      partition_graph=partition_graph)
        st = TripleStore.from_table(spark, table, has_named_graphs=has_named_graphs)
        return TripleStore._apply_flags_sidecar(spark, path, st)

    @staticmethod
    def from_table(
        spark: SparkSession, table: str, has_named_graphs: bool | None = None
    ) -> "TripleStore":
        """Read a write_bucketed table; scans keep the bucket metadata
        so subject joins skip the shuffle (verify: no Exchange in
        explain)."""
        df = spark.read.table(table)
        st = TripleStore(
            spark,
            df.select(*[f.name for f in STATEMENTS_SCHEMA.fields]),
            has_named_graphs=has_named_graphs,
        )
        return TripleStore._apply_flags_tblproperties(spark, table, st)


def _apply_load_closure(st: "TripleStore", closure: str) -> "TripleStore":
    """DataLoader ClosureEnum analog (store/DataLoader.java:76): 'none'
    loads only; 'batch' runs the forward closure over the loaded data
    in the same call (inferred rows stype-tagged by rdfs_closure)."""
    if closure == "none":
        return st
    if closure == "batch":
        return st.closure()
    raise ValueError(f"closure must be 'none' or 'batch', got {closure!r}")
