"""Generic Object Model (GOM) — the reference's object-graph API over
the triple store (bigdata-gom: om/ObjectManager.java, om/ObjectMgrModel.java,
gpo/GPO.java, gpo/IGPO.java, gpo/LinkSet.java).

A ``GPO`` (Generic Persistent Object) wraps one resource and exposes
its forward properties (``get_value``/``get_values``), link sets in
both directions (``get_links_out``/``get_links_in`` —
IGPO.java:137-146), membership tests, and mutation
(``set_value``/``add_value``/``remove_value``/``remove``).  The
``ObjectManager`` interns GPOs per resource (one in-memory object per
id — ObjectMgrModel's GPO dictionary), evaluates SPARQL
(IObjectManager.evaluate/execute), and batches mutations through
native transactions (INativeTransaction.java:
begin/commit/rollbackNativeTransaction — the reference buffers the
statement delta per transaction and flushes it on the OUTERMOST
commit, ObjectMgrModel.java flush logic).

Object materialization is driver-side BY DESIGN — this is the
object-at-a-time navigation API, not the bulk path.  The scale story
is (a) ``materialize_many`` — one filtered scan (subject/object key
pushdown) materializes a whole working set in a single Spark job, the
IObjectManager.initGPOs analog — and (b) every mutation flushes as one
batched statements-DataFrame add/remove, never a statement at a time.

GOM binds to a TRIPLES-mode store (the reference stacks GOM on a
plain Sail connection); a quads store is rejected up front.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import functions as F

from bigdata_old_spark.model import (
    KIND_BNODE,
    KIND_IRI,
    Term,
    statements_df_from_terms,
)


def _resource_term(rid: str) -> Term:
    return Term.bnode(rid[2:]) if rid.startswith("_:") else Term.iri(rid)


class GPO:
    """Generic Persistent Object (gpo/GPO.java) — one resource, its
    forward property values and reverse links, lazily materialized."""

    def __init__(self, om: "ObjectManager", rid: str) -> None:
        self._om = om
        self._id = rid
        self._materialized = False
        self._fwd: dict[str, list[Term]] = {}
        self._rev: dict[str, list[str]] = {}

    # -- identity ------------------------------------------------------------
    @property
    def id(self) -> str:  # noqa: A003 (IGPO.getId)
        return self._id

    def object_manager(self) -> "ObjectManager":
        return self._om

    def __repr__(self) -> str:  # pragma: no cover
        return f"GPO({self._id})"

    # -- materialization -------------------------------------------------
    def materialize(self) -> "GPO":
        """Load this object's statements (both directions) if not
        already in memory (IGPO.materialize).  Use
        ``ObjectManager.materialize_many`` to batch a working set into
        one Spark job."""
        if not self._materialized:
            self._om.materialize_many([self._id])
        return self

    def invalidate(self) -> None:
        """Drop the in-memory state; next access re-reads the store."""
        self._materialized = False
        self._fwd = {}
        self._rev = {}

    def _ensure(self) -> None:
        if not self._materialized:
            self.materialize()

    # -- reads (IGPO) ------------------------------------------------------
    def get_value(self, predicate: str) -> Term | None:
        """First value for the property, in a deterministic (sorted)
        order — IGPO.getValue's 'one value' accessor."""
        vals = self.get_values(predicate)
        return vals[0] if vals else None

    def get_values(self, predicate: str) -> list[Term]:
        self._ensure()
        return list(self._fwd.get(predicate, []))

    def is_bound(self, predicate: str) -> bool:
        self._ensure()
        return bool(self._fwd.get(predicate))

    def get_links_out(self, predicate: str | None = None) -> list["GPO"]:
        """GPOs this object links TO (resource-valued properties);
        with ``predicate`` only that link set (IGPO.getLinksOut)."""
        self._ensure()
        preds = [predicate] if predicate is not None else sorted(self._fwd)
        out: list[GPO] = []
        seen: set[str] = set()
        for p in preds:
            for t in self._fwd.get(p, []):
                if t.kind in (KIND_IRI, KIND_BNODE):
                    rid = f"_:{t.lex}" if t.kind == KIND_BNODE else t.lex
                    if rid not in seen:
                        seen.add(rid)
                        out.append(self._om.get_gpo(rid))
        return out

    def get_links_in(self, predicate: str | None = None) -> list["GPO"]:
        """GPOs linking TO this object (IGPO.getLinksIn)."""
        self._ensure()
        preds = [predicate] if predicate is not None else sorted(self._rev)
        out: list[GPO] = []
        seen: set[str] = set()
        for p in preds:
            for s in self._rev.get(p, []):
                if s not in seen:
                    seen.add(s)
                    out.append(self._om.get_gpo(s))
        return out

    def get_reverse_link_properties(self) -> dict[str, int]:
        """property → #incoming links (IGPO.getReverseLinkProperties)."""
        self._ensure()
        return {p: len(ss) for p, ss in sorted(self._rev.items())}

    def get_statements(self) -> list[tuple[str, str, Term]]:
        """This object's forward statements (IGPO.getStatements)."""
        self._ensure()
        return [
            (self._id, p, t) for p in sorted(self._fwd) for t in self._fwd[p]
        ]

    # -- mutation (buffered through the OM's native transaction) -----------
    def add_value(self, predicate: str, value) -> None:
        t = Term.from_python(value)
        self._ensure()
        # buffer FIRST: if the OM rejects the row (e.g. remote bnode
        # validation) the in-memory view stays untouched
        self._om._buffer_add(self._id, predicate, t)
        if t not in self._fwd.get(predicate, []):
            self._fwd.setdefault(predicate, []).append(t)
            self._fwd[predicate].sort(key=lambda x: (x.kind, x.lex, x.dt or "", x.lang or ""))

    def set_value(self, predicate: str, value) -> None:
        """Replace ALL values of the property (IGPO.setValue).

        The new value is validated BEFORE the old values are removed so a
        rejected value (e.g. a blank node on a RemoteObjectManager at tx
        depth 0) leaves both the store and the in-memory view untouched."""
        t = Term.from_python(value)
        self._ensure()
        self._om._validate_add(self._id, predicate, t)
        self.remove_values(predicate)
        self.add_value(predicate, value)

    def remove_value(self, predicate: str, value) -> None:
        t = Term.from_python(value)
        self._ensure()
        self._om._buffer_remove(self._id, predicate, t)
        vals = self._fwd.get(predicate, [])
        if t in vals:
            vals.remove(t)
            if not vals:
                self._fwd.pop(predicate, None)

    def remove_values(self, predicate: str) -> None:
        self._ensure()
        for t in self._fwd.pop(predicate, []):
            self._om._buffer_remove(self._id, predicate, t)

    def remove(self) -> None:
        """Remove the object: every forward statement AND every
        incoming link (IGPO.remove retracts both directions).  Other
        INTERNED materialized GPOs' in-memory views are kept coherent
        in both directions: linkers-in lose their forward value, link
        targets lose their reverse entry."""
        self._ensure()
        # forward: also drop self from each resource target's _rev
        for p in list(self._fwd):
            for t in self._fwd.get(p, []):
                if t.kind in (KIND_IRI, KIND_BNODE):
                    orid = f"_:{t.lex}" if t.kind == KIND_BNODE else t.lex
                    target = self._om._gpos.get(orid)
                    if target is not None and target._materialized:
                        subs = target._rev.get(p, [])
                        if self._id in subs:
                            subs.remove(self._id)
                            if not subs:
                                target._rev.pop(p, None)
            self.remove_values(p)
        me = _resource_term(self._id)
        for p, subjects in list(self._rev.items()):
            for s in subjects:
                self._om._buffer_remove(s, p, me)
                other = self._om._gpos.get(s)
                if other is not None and other._materialized:
                    vals = other._fwd.get(p, [])
                    if me in vals:
                        vals.remove(me)
                        if not vals:
                            other._fwd.pop(p, None)
        self._rev = {}


class _ObjectManagerBase:
    """Shared GPO interning + native-transaction buffering
    (om/ObjectMgrModel.java); subclasses supply materialize_many and
    _flush against their backing store (embedded vs remote)."""

    def __init__(self) -> None:
        self._gpos: dict[str, GPO] = {}
        self._tx_depth = 0
        self._adds: list[tuple] = []
        self._removes: list[tuple] = []

    def get_gpo(self, rid: str) -> GPO:
        """Interned GPO for the resource (IObjectManager.getGPO) —
        repeated calls return the SAME object."""
        gpo = self._gpos.get(rid)
        if gpo is None:
            gpo = self._gpos[rid] = GPO(self, rid)
        return gpo

    def materialize_many(self, rids: Iterable[str]) -> dict[str, GPO]:
        raise NotImplementedError

    def _flush(self) -> None:
        raise NotImplementedError

    def _invalidate_all(self) -> None:
        for gpo in self._gpos.values():
            gpo.invalidate()

    # -- native transactions (INativeTransaction) -------------------------
    def begin_native_transaction(self) -> int:
        self._tx_depth += 1
        return self._tx_depth

    def commit_native_transaction(self, expected_depth: int | None = None) -> None:
        """Pop one transaction level; the OUTERMOST commit flushes the
        buffered statement delta as one batched remove + add."""
        if self._tx_depth <= 0:
            raise RuntimeError("no active native transaction")
        if expected_depth is not None and expected_depth != self._tx_depth:
            raise RuntimeError(
                f"transaction depth mismatch: expected {expected_depth}, at {self._tx_depth}"
            )
        self._tx_depth -= 1
        if self._tx_depth == 0:
            self._flush()

    def rollback_native_transaction(self) -> None:
        """Discard the buffered delta and invalidate interned GPOs
        (their optimistic in-memory edits are dropped too)."""
        self._tx_depth = 0
        self._adds = []
        self._removes = []
        self._invalidate_all()

    # -- buffering ---------------------------------------------------------
    def _validate_add(self, s: str, p: str, t: Term) -> None:
        """Pre-flight check that a row would be accepted by _buffer_add —
        no-op locally; RemoteObjectManager rejects unshippable rows.  Lets
        compound mutations (set_value = remove+add) validate the add
        BEFORE performing the destructive remove."""

    def _buffer_add(self, s: str, p: str, t: Term) -> None:
        row = (None, s, p, t)
        self._removes = [r for r in self._removes if r != row]
        self._adds.append(row)
        if self._tx_depth == 0:
            self._flush()

    def _buffer_remove(self, s: str, p: str, t: Term) -> None:
        row = (None, s, p, t)
        self._adds = [r for r in self._adds if r != row]
        self._removes.append(row)
        if self._tx_depth == 0:
            self._flush()


class ObjectManager(_ObjectManagerBase):
    """om/ObjectManager.java analog: interned GPOs, SPARQL access, and
    buffered native transactions over an EMBEDDED TripleStore."""

    def __init__(self, store) -> None:
        if store.has_named_graphs:
            raise ValueError(
                "GOM binds to a triples-mode store (the reference stacks "
                "GOM on a plain Sail connection, not a quads KB)"
            )
        super().__init__()
        self._store = store

    # -- store access --------------------------------------------------------
    @property
    def store(self):
        return self._store

    def evaluate(self, sparql: str):
        """Run a SPARQL query against the current store
        (IObjectManager.evaluate)."""
        return self._store.query(sparql)

    def execute(self, sparql_update: str) -> None:
        """Run a SPARQL UPDATE (IObjectManager.execute); all interned
        GPOs are invalidated — their next access re-reads the store."""
        self._store = self._store.update(sparql_update)
        self._invalidate_all()

    # -- batched materialization ----------------------------------------
    def materialize_many(self, rids: Iterable[str]) -> dict[str, GPO]:
        """Materialize a working set in ONE filtered scan + collect —
        the IObjectManager.initGPOs analog.  Subject/object id sets
        push into the scan as IN-filters; only matching rows ship to
        the driver."""
        rids = list(dict.fromkeys(rids))
        if not rids:
            return {}
        st = self._store.statements
        iri_ids = [r for r in rids if not r.startswith("_:")]
        bn_ids = [r[2:] for r in rids if r.startswith("_:")]
        o_hit = F.lit(False)
        if iri_ids:
            o_hit = o_hit | ((F.col("o_kind") == KIND_IRI) & F.col("o_lex").isin(iri_ids))
        if bn_ids:
            o_hit = o_hit | ((F.col("o_kind") == KIND_BNODE) & F.col("o_lex").isin(bn_ids))
        rows = st.where(F.col("s").isin(rids) | o_hit).collect()
        out: dict[str, GPO] = {}
        for rid in rids:
            gpo = self.get_gpo(rid)
            gpo._fwd, gpo._rev = {}, {}
            gpo._materialized = True
            out[rid] = gpo
        targets = set(rids)
        for r in rows:
            t = Term(
                kind=r["o_kind"], lex=r["o_lex"],
                dt=r["o_dt"], lang=r["o_lang"],
            )
            if r["s"] in targets:
                out[r["s"]]._fwd.setdefault(r["p"], []).append(t)
            if t.kind in (KIND_IRI, KIND_BNODE):
                orid = f"_:{t.lex}" if t.kind == KIND_BNODE else t.lex
                if orid in targets:
                    out[orid]._rev.setdefault(r["p"], []).append(r["s"])
        for gpo in out.values():
            for vals in gpo._fwd.values():
                vals.sort(key=lambda x: (x.kind, x.lex, x.dt or "", x.lang or ""))
            for ss in gpo._rev.values():
                ss.sort()
        return out

    def _flush(self) -> None:
        spark = self._store.spark
        if self._removes:
            self._store = self._store.remove(
                statements_df_from_terms(self._removes, spark)
            )
            self._removes = []
        if self._adds:
            self._store = self._store.add(
                statements_df_from_terms(self._adds, spark)
            )
            self._adds = []


def _nt_term(t: Term) -> str:
    """One RDF term → its SPARQL/N-Triples token (update templates)."""
    from bigdata_old_spark.service import _escape_lex

    if t.kind == KIND_IRI:
        return f"<{t.lex}>"
    if t.kind == KIND_BNODE:
        return f"_:{t.lex}"
    lex = f'"{_escape_lex(t.lex)}"'
    if t.lang:
        return f"{lex}@{t.lang}"
    if t.dt and t.dt != "http://www.w3.org/2001/XMLSchema#string":
        return f"{lex}^^<{t.dt}>"
    return lex


class RemoteObjectManager(_ObjectManagerBase):
    """om/NanoSparqlObjectManager.java analog: the SAME GPO surface,
    but every read is a SPARQL 1.1 Protocol query and every flush a
    SPARQL UPDATE against a REMOTE endpoint (this engine's
    NanoSparqlServer analog or any other SPARQL 1.1 server).

    Working-set materialization is one SELECT with VALUES-bound
    subject/object positions (both directions in one round trip);
    mutations batch into one ``DELETE DATA``/``INSERT DATA`` request
    at the outermost commit.  Blank-node ids cannot be addressed over
    the wire (no stable label identity at the endpoint — the reference
    remote OM shares this limit); reads of bnode-valued links still
    work, navigation INTO a bnode does not.
    """

    def __init__(self, endpoint: str) -> None:
        super().__init__()
        self.endpoint = endpoint

    # -- protocol I/O -------------------------------------------------------
    def _query_json(self, sparql: str) -> dict:
        import json as _json

        from bigdata_old_spark import service as _svc

        transport = _svc._transport or _svc.default_transport
        return _json.loads(transport(self.endpoint, sparql))

    def evaluate(self, sparql: str) -> list[dict[str, Term]]:
        """SELECT against the endpoint → list of {var: Term} rows
        (IObjectManager.evaluate; driver-side by design — this is the
        object-navigation API, not the bulk path)."""
        from bigdata_old_spark.service import _json_term

        doc = self._query_json(sparql)
        return [
            {n: _json_term(b[n]) for n in b}
            for b in doc["results"]["bindings"]
        ]

    def execute(self, sparql_update: str) -> None:
        """SPARQL UPDATE over the protocol (POST update=)."""
        from urllib.parse import urlencode
        from urllib.request import Request, urlopen

        req = Request(
            self.endpoint,
            data=urlencode({"update": sparql_update}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urlopen(req, timeout=30) as resp:
            resp.read()
        self._invalidate_all()

    # -- batched materialization ----------------------------------------
    def materialize_many(self, rids: Iterable[str]) -> dict[str, GPO]:
        """One SELECT round trip for the whole working set: VALUES
        blocks bind the subject and object positions (initGPOs analog,
        vectored like the SERVICE client)."""
        from bigdata_old_spark.service import _json_term

        rids = list(dict.fromkeys(rids))
        out: dict[str, GPO] = {}
        for rid in rids:
            gpo = self.get_gpo(rid)
            gpo._fwd, gpo._rev = {}, {}
            gpo._materialized = True
            out[rid] = gpo
        iris = " ".join(f"<{r}>" for r in rids if not r.startswith("_:"))
        if not iris:
            return out
        q = (
            "SELECT DISTINCT ?s ?p ?o WHERE { "
            f"{{ VALUES ?s {{ {iris} }} ?s ?p ?o }} UNION "
            f"{{ VALUES ?o {{ {iris} }} ?s ?p ?o }} }}"
        )
        doc = self._query_json(q)
        targets = set(rids)
        for b in doc["results"]["bindings"]:
            s = _json_term(b["s"])
            p = _json_term(b["p"]).lex
            o = _json_term(b["o"])
            sid = f"_:{s.lex}" if s.kind == KIND_BNODE else s.lex
            if sid in targets:
                out[sid]._fwd.setdefault(p, []).append(o)
            if o.kind in (KIND_IRI, KIND_BNODE):
                orid = f"_:{o.lex}" if o.kind == KIND_BNODE else o.lex
                if orid in targets:
                    out[orid]._rev.setdefault(p, []).append(sid)
        for gpo in out.values():
            for vals in gpo._fwd.values():
                vals.sort(key=lambda x: (x.kind, x.lex, x.dt or "", x.lang or ""))
            for ss in gpo._rev.values():
                ss.sort()
        return out

    # -- flush -------------------------------------------------------------
    @staticmethod
    def _wire_triple(s: str, p: str, t: Term) -> str:
        if s.startswith("_:") or t.kind == KIND_BNODE:
            # SPARQL forbids bnodes in DELETE DATA, and an INSERT DATA
            # bnode would mint a FRESH node at the endpoint — neither
            # expresses the intended edit (reference remote-OM limit)
            raise ValueError(
                "remote GOM cannot ship blank-node statements over the "
                "SPARQL protocol; mutate bnode-linked state via execute()"
            )
        return f"<{s}> <{p}> {_nt_term(t)}"

    def _validate_add(self, s: str, p: str, t: Term) -> None:
        self._wire_triple(s, p, t)

    def _buffer_add(self, s: str, p: str, t: Term) -> None:
        # validate at BUFFER time: an unshippable row must never enter
        # the buffer (it would poison every later flush)
        self._wire_triple(s, p, t)
        super()._buffer_add(s, p, t)

    def _buffer_remove(self, s: str, p: str, t: Term) -> None:
        self._wire_triple(s, p, t)
        super()._buffer_remove(s, p, t)

    def _flush(self) -> None:
        parts = []
        if self._removes:
            triples = " . ".join(
                self._wire_triple(s, p, t) for (_, s, p, t) in self._removes
            )
            parts.append(f"DELETE DATA {{ {triples} }}")
        if self._adds:
            triples = " . ".join(
                self._wire_triple(s, p, t) for (_, s, p, t) in self._adds
            )
            parts.append(f"INSERT DATA {{ {triples} }}")
        if parts:
            from urllib.parse import urlencode
            from urllib.request import Request, urlopen

            req = Request(
                self.endpoint,
                data=urlencode({"update": " ; ".join(parts)}).encode(),
                headers={"Content-Type": "application/x-www-form-urlencoded"},
            )
            with urlopen(req, timeout=30) as resp:
                resp.read()
        # clear only AFTER a successful send — a transport failure
        # keeps the delta for retry or rollback
        self._removes = []
        self._adds = []


# ---------------------------------------------------------------------------
# Skins (gpo/IGenericSkin.java, gpo/BasicSkin.java, IGPO.asClass):
# typed application-facing wrappers around a GPO, interned per
# (gpo, class) like the reference's skin cache
# ---------------------------------------------------------------------------

class BasicSkin:
    """gpo/BasicSkin.java analog: typed get/set convenience over a
    GPO.  Subclass for application-specific skins and obtain instances
    through ``gpo.as_class(MySkin)`` — the GPO caches one skin per
    class (GPO.asClass interning)."""

    def __init__(self, gpo: GPO) -> None:
        self.gpo = gpo

    def as_generic(self) -> GPO:
        return self.gpo

    def set_value(self, predicate: str, value) -> None:
        self.gpo.set_value(predicate, value)

    def get_string(self, predicate: str) -> str | None:
        t = self.gpo.get_value(predicate)
        return t.lex if t is not None else None

    def get_int(self, predicate: str) -> int:
        t = self.gpo.get_value(predicate)
        return int(t.lex) if t is not None else 0

    def get_double(self, predicate: str) -> float:
        t = self.gpo.get_value(predicate)
        return float(t.lex) if t is not None else 0.0

    def get_boolean(self, predicate: str) -> bool:
        t = self.gpo.get_value(predicate)
        return t is not None and t.lex in ("true", "1")

    def get_gpo(self, predicate: str) -> GPO | None:
        """Resource-valued property → its (interned) GPO."""
        t = self.gpo.get_value(predicate)
        if t is None or t.kind not in (KIND_IRI, KIND_BNODE):
            return None
        rid = f"_:{t.lex}" if t.kind == KIND_BNODE else t.lex
        return self.gpo.object_manager().get_gpo(rid)


def _gpo_as_class(self: GPO, skin_class) -> "BasicSkin":
    """IGPO.asClass: wrap this GPO in the given skin class (must
    subclass BasicSkin); one cached instance per class."""
    if not issubclass(skin_class, BasicSkin):
        raise TypeError(f"{skin_class.__name__} is not a BasicSkin subclass")
    cache = getattr(self, "_skins", None)
    if cache is None:
        cache = self._skins = {}
    skin = cache.get(skin_class)
    if skin is None:
        skin = cache[skin_class] = skin_class(self)
    return skin


GPO.as_class = _gpo_as_class
