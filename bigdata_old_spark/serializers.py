"""SPARQL result serializers — the conneg surface.

The reference negotiates SELECT/ASK result writers (SPARQL-XML/JSON/
CSV/TSV) and RDF statement writers for CONSTRUCT/DESCRIBE via
ConnegUtil (bigdata-sails/.../webapp/ConnegUtil.java) over the openrdf
writer registries.  Here each row is serialized JVM-side with Catalyst
string expressions — the per-row work distributes over the cluster and
only the (small) protocol envelope is assembled on the driver.  Every
writer also has a ``write_*`` file variant that streams the serialized
lines with Spark's distributed text writer, never collecting.

Formats: SPARQL Query Results XML / JSON / CSV / TSV (W3C specs), and
N-Triples / N-Quads / Turtle for statement-shaped results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark.model import (
    KIND_BNODE,
    KIND_IRI,
    XSD_STRING,
)

# MIME → format key (ConnegUtil parity)
MIME_FORMATS = {
    "application/sparql-results+json": "json",
    "application/json": "json",
    "application/sparql-results+xml": "xml",
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
    "application/n-triples": "ntriples",
    "text/plain": "ntriples",
    "application/n-quads": "nquads",
    "text/turtle": "turtle",
    "application/rdf+xml": "rdfxml",
    "application/trix": "trix",
    "application/trig": "trig",
    "application/rdf+json": "rdfjson",
    "application/ld+json": "jsonld",
    "text/rdf+n3": "n3",
    "text/n3": "n3",
}


def _nt_escape(c: Column) -> Column:
    """N-Triples / TSV literal escaping."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def term_n3(t: Column) -> Column:
    """Term struct → N-Triples serialization (Column form of Term.n3)."""
    lit = F.concat(F.lit('"'), _nt_escape(t["lex"]), F.lit('"'))
    lit = (
        F.when(t["lang"].isNotNull(), F.concat(lit, F.lit("@"), t["lang"]))
        .when(
            t["dt"].isNotNull() & (t["dt"] != XSD_STRING),
            F.concat(lit, F.lit("^^<"), t["dt"], F.lit(">")),
        )
        .otherwise(lit)
    )
    return (
        F.when(t.isNull(), F.lit(None))
        .when(t["kind"] == KIND_IRI, F.concat(F.lit("<"), t["lex"], F.lit(">")))
        .when(t["kind"] == KIND_BNODE, F.concat(F.lit("_:"), t["lex"]))
        .otherwise(lit)
    )


def _xml_escape(c: Column) -> Column:
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    return c


# ---------------------------------------------------------------------------
# SELECT results
# ---------------------------------------------------------------------------

def _term_cols(df: DataFrame) -> list[str]:
    """Projected term-struct columns, in projection order."""
    from pyspark.sql import types as T

    return [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.StructType) and not f.name.startswith("__")
    ]


def json_rows(df: DataFrame) -> DataFrame:
    """One W3C SPARQL-JSON binding object per solution (column `row`)."""
    cols = _term_cols(df)
    bindings = []
    for v in cols:
        t = F.col(v)
        obj = F.struct(
            F.when(t["kind"] == KIND_IRI, F.lit("uri"))
            .when(t["kind"] == KIND_BNODE, F.lit("bnode"))
            .otherwise(F.lit("literal")).alias("type"),
            t["lex"].alias("value"),
            # lang-tagged literals carry only xml:lang (rdf:langString
            # is implied in RDF 1.1, not serialized)
            F.when(
                (t["kind"] != KIND_IRI) & (t["kind"] != KIND_BNODE)
                & t["lang"].isNull()
                & t["dt"].isNotNull() & (t["dt"] != XSD_STRING),
                t["dt"],
            ).alias("datatype"),
            t["lang"].alias("xml:lang"),
        )
        bindings.append(F.when(t.isNotNull(), obj).alias(v))
    return df.select(F.to_json(F.struct(*bindings)).alias("row"))


def _ask_value(df: DataFrame) -> bool | None:
    """ASK results are a single boolean column — the protocol envelope
    differs (boolean member / <boolean> element, W3C SPARQL results
    formats §ASK)."""
    import pyspark.sql.types as T

    if len(df.schema.fields) == 1 and isinstance(df.schema.fields[0].dataType, T.BooleanType):
        rows = df.collect()
        return bool(rows[0][0]) if rows else False
    return None


def sparql_json(df: DataFrame) -> str:
    """Full application/sparql-results+json document (driver assembles
    the envelope; each binding object was serialized JVM-side)."""
    import json as _json

    ask = _ask_value(df)
    if ask is not None:
        return _json.dumps({"head": {}, "boolean": ask})
    cols = _term_cols(df)
    head = _json.dumps({"head": {"vars": cols}})[:-1]
    rows = [r["row"] for r in json_rows(df).collect()]
    return head + ', "results": {"bindings": [' + ", ".join(rows) + "]}}"


def xml_rows(df: DataFrame) -> DataFrame:
    """One `<result>…</result>` element per solution (column `row`)."""
    cols = _term_cols(df)
    parts: list[Column] = [F.lit("  <result>")]
    for v in cols:
        t = F.col(v)
        lex = _xml_escape(t["lex"])
        body = (
            F.when(t["kind"] == KIND_IRI, F.concat(F.lit("<uri>"), lex, F.lit("</uri>")))
            .when(t["kind"] == KIND_BNODE, F.concat(F.lit("<bnode>"), lex, F.lit("</bnode>")))
            .otherwise(F.concat(
                F.lit("<literal"),
                F.coalesce(F.concat(F.lit(' xml:lang="'), t["lang"], F.lit('"')), F.lit("")),
                F.coalesce(
                    F.when(t["lang"].isNull() & (t["dt"] != XSD_STRING),
                           F.concat(F.lit(' datatype="'), _xml_escape(t["dt"]), F.lit('"'))),
                    F.lit(""),
                ),
                F.lit(">"), lex, F.lit("</literal>"),
            ))
        )
        parts.append(
            F.coalesce(
                F.when(t.isNotNull(), F.concat(
                    F.lit(f'\n    <binding name="{v}">'), body, F.lit("</binding>"))),
                F.lit(""),
            )
        )
    parts.append(F.lit("\n  </result>"))
    return df.select(F.concat(*parts).alias("row"))


def sparql_xml(df: DataFrame) -> str:
    ask = _ask_value(df)
    if ask is not None:
        return (
            '<?xml version="1.0"?>\n'
            '<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n'
            f"<head/>\n<boolean>{'true' if ask else 'false'}</boolean>\n</sparql>\n"
        )
    cols = _term_cols(df)
    head = (
        '<?xml version="1.0"?>\n'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n'
        "<head>\n"
        + "".join(f'  <variable name="{v}"/>\n' for v in cols)
        + "</head>\n<results>\n"
    )
    rows = [r["row"] for r in xml_rows(df).collect()]
    return head + "\n".join(rows) + "\n</results>\n</sparql>\n"


def _csv_field(t: Column) -> Column:
    """W3C SPARQL-CSV: plain lexical value, RFC4180-quoted when needed."""
    lex = F.coalesce(t["lex"], F.lit(""))
    needs = lex.contains(",") | lex.contains('"') | lex.contains("\n") | lex.contains("\r")
    quoted = F.concat(F.lit('"'), F.regexp_replace(lex, '"', '""'), F.lit('"'))
    return F.when(needs, quoted).otherwise(lex)


def csv_rows(df: DataFrame) -> DataFrame:
    cols = _term_cols(df)
    return df.select(F.concat_ws(",", *[_csv_field(F.col(v)) for v in cols]).alias("row"))


def sparql_csv(df: DataFrame) -> str:
    cols = _term_cols(df)
    rows = [r["row"] for r in csv_rows(df).collect()]
    return "\r\n".join([",".join(cols)] + rows) + "\r\n"


def tsv_rows(df: DataFrame) -> DataFrame:
    """W3C SPARQL-TSV: full term syntax per field."""
    cols = _term_cols(df)
    return df.select(
        F.concat_ws("\t", *[F.coalesce(term_n3(F.col(v)), F.lit("")) for v in cols]).alias("row")
    )


def sparql_tsv(df: DataFrame) -> str:
    cols = _term_cols(df)
    rows = [r["row"] for r in tsv_rows(df).collect()]
    return "\n".join(["\t".join("?" + v for v in cols)] + rows) + "\n"


# ---------------------------------------------------------------------------
# Statement-shaped results (CONSTRUCT / DESCRIBE) → RDF writers
# ---------------------------------------------------------------------------

def ntriples_rows(df: DataFrame) -> DataFrame:
    """Statements (s/p/o term structs) → one N-Triples line per row."""
    return df.select(
        F.concat_ws(" ", term_n3(F.col("s")), term_n3(F.col("p")), term_n3(F.col("o")), F.lit(".")).alias("row")
    )


def ntriples(df: DataFrame) -> str:
    return "\n".join(r["row"] for r in ntriples_rows(df).collect()) + "\n"


def nquads_rows(df: DataFrame) -> DataFrame:
    """Quads (g/s/p/o; g a term struct or NULL) → N-Quads lines."""
    g = F.col("g")
    return df.select(
        F.concat_ws(
            " ",
            term_n3(F.col("s")), term_n3(F.col("p")), term_n3(F.col("o")),
            *([F.when(g.isNotNull(), term_n3(g))] if "g" in df.columns else []),
            F.lit("."),
        ).alias("row")
    )


def _xml_attr_escape(c: Column) -> Column:
    return F.regexp_replace(_xml_escape(c), '"', "&quot;")


def rdfxml_rows(df: DataFrame) -> DataFrame:
    """Statements (s/p/o term structs) → one RDF/XML ``rdf:Description``
    element per row, built JVM-side (distributed; the envelope writer
    only collects the fragments).  Each property element declares its
    namespace inline (``<p:local xmlns:p="ns">``), the standard writer
    trick that needs no global prefix table — the same split Sesame's
    RDFXMLWriter performs (reference conneg serves CONSTRUCT/DESCRIBE
    through it, webapp/ConnegUtil.java)."""
    s, p, o = F.col("s"), F.col("p"), F.col("o")
    local = F.regexp_extract(p["lex"], r"([A-Za-z_][A-Za-z0-9_.\-]*)$", 1)
    ns = p["lex"].substr(F.lit(1), F.length(p["lex"]) - F.length(local))
    subj_attr = F.when(
        s["kind"] == KIND_BNODE,
        F.concat(F.lit(' rdf:nodeID="b'), s["lex"], F.lit('"')),
    ).otherwise(F.concat(F.lit(' rdf:about="'), _xml_attr_escape(s["lex"]), F.lit('"')))
    open_tag = F.concat(F.lit("<p:"), local, F.lit(' xmlns:p="'), _xml_attr_escape(ns), F.lit('"'))
    lit_attrs = (
        F.when(o["lang"].isNotNull(), F.concat(F.lit(' xml:lang="'), o["lang"], F.lit('"')))
        .when(
            o["dt"].isNotNull() & (o["dt"] != XSD_STRING),
            F.concat(F.lit(' rdf:datatype="'), _xml_attr_escape(o["dt"]), F.lit('"')),
        )
        .otherwise(F.lit(""))
    )
    prop = (
        F.when(o["kind"] == KIND_IRI,
               F.concat(open_tag, F.lit(' rdf:resource="'), _xml_attr_escape(o["lex"]), F.lit('"/>')))
        .when(o["kind"] == KIND_BNODE,
              F.concat(open_tag, F.lit(' rdf:nodeID="b'), o["lex"], F.lit('"/>')))
        .otherwise(
            F.concat(open_tag, lit_attrs, F.lit(">"), _xml_escape(o["lex"]),
                     F.lit("</p:"), local, F.lit(">"))
        )
    )
    return df.select(
        F.concat(
            F.lit("  <rdf:Description"), subj_attr, F.lit(">\n    "),
            prop, F.lit("\n  </rdf:Description>"),
        ).alias("row"),
        (F.length(local) == 0).alias("__badpred"),
    )


def rdfxml(df: DataFrame) -> str:
    """RDF/XML document for CONSTRUCT/DESCRIBE results (the writer the
    reference's conneg picks for ``application/rdf+xml``).  Raises on a
    predicate IRI with no XML-QName-able local part, like Sesame's
    writer does."""
    rows = rdfxml_rows(df).collect()
    if any(r["__badpred"] for r in rows):
        raise ValueError("predicate IRI has no XML local name (cannot serialize as RDF/XML)")
    body = "\n".join(r["row"] for r in rows)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
        + body
        + ("\n" if body else "")
        + "</rdf:RDF>\n"
    )


def turtle(df: DataFrame, prefixes: dict[str, str] | None = None) -> str:
    """Turtle with prefix abbreviation and subject grouping — a
    driver-side pretty writer for protocol responses (for bulk export
    use write_results with ntriples: it streams)."""
    prefixes = prefixes or {}

    def abbrev(n3: str) -> str:
        if n3.startswith("<") and n3.endswith(">"):
            iri = n3[1:-1]
            for pfx, ns in prefixes.items():
                if iri.startswith(ns) and "/" not in iri[len(ns):] and "#" not in iri[len(ns):]:
                    return f"{pfx}:{iri[len(ns):]}"
        return n3

    rows = [
        (abbrev(r["s"]), abbrev(r["p"]), abbrev(r["o"]))
        for r in df.select(
            term_n3(F.col("s")).alias("s"),
            term_n3(F.col("p")).alias("p"),
            term_n3(F.col("o")).alias("o"),
        ).collect()
    ]
    out = [f"@prefix {p}: <{ns}> ." for p, ns in prefixes.items()]
    if out:
        out.append("")
    by_subj: dict[str, list[tuple[str, str]]] = {}
    for s, p, o in rows:
        by_subj.setdefault(s, []).append((p, o))
    for s, pos in by_subj.items():
        body = " ;\n    ".join(f"{p} {o}" for p, o in pos)
        out.append(f"{s} {body} .")
    return "\n".join(out) + "\n"


def _trix_term(t: Column) -> Column:
    """Term struct → one TriX element (W3C TriX note; the reference
    serves TriX through Sesame's TriXWriter — ConnegUtil.java:122-144
    registry)."""
    esc = _xml_escape(t["lex"])
    plain = F.concat(
        F.lit("<plainLiteral"),
        F.when(t["lang"].isNotNull(),
               F.concat(F.lit(' xml:lang="'), _xml_attr_escape(t["lang"]),
                        F.lit('"'))).otherwise(F.lit("")),
        F.lit(">"), esc, F.lit("</plainLiteral>"))
    typed = F.concat(F.lit('<typedLiteral datatype="'),
                     _xml_attr_escape(t["dt"]), F.lit('">'), esc,
                     F.lit("</typedLiteral>"))
    return (
        F.when(t["kind"] == KIND_IRI, F.concat(F.lit("<uri>"), esc, F.lit("</uri>")))
        .when(t["kind"] == KIND_BNODE, F.concat(F.lit("<id>"), esc, F.lit("</id>")))
        .when(t["lang"].isNotNull(), plain)
        .when(t["dt"].isNotNull() & (t["dt"] != XSD_STRING), typed)
        .otherwise(plain)
    )


def trix_rows(df: DataFrame) -> DataFrame:
    """Statements (s/p/o term structs, optional flat-string ``g``) →
    one ``<triple>…</triple>`` fragment per row, serialized JVM-side;
    the tiny envelope/graph grouping happens on the driver (trix)."""
    g = (F.col("g") if "g" in df.columns
         else F.lit(None).cast("string"))
    return df.select(
        F.concat(F.lit("      <triple>"), _trix_term(F.col("s")),
                 _trix_term(F.col("p")), _trix_term(F.col("o")),
                 F.lit("</triple>")).alias("row"),
        g.alias("__g"),
    )


def trix(df: DataFrame) -> str:
    """TriX document; rows with a non-null ``g`` column group into
    named ``<graph>`` blocks, the rest into one unnamed graph."""
    from xml.sax.saxutils import escape

    groups: dict[str | None, list[str]] = {}
    for r in trix_rows(df).collect():
        groups.setdefault(r["__g"], []).append(r["row"])
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">']
    for g in sorted(groups, key=lambda x: (x is not None, x or "")):
        out.append("  <graph>")
        if g is not None:
            out.append(f"    <uri>{escape(g)}</uri>")
        out.extend(groups[g])
        out.append("  </graph>")
    out.append("</TriX>")
    return "\n".join(out) + "\n"


def trig(df: DataFrame, prefixes: dict[str, str] | None = None) -> str:
    """TriG writer (the quads counterpart of :func:`turtle`): rows with
    a non-null flat-string ``g`` column group into named ``<g> { … }``
    blocks, the rest serialize as top-level (default-graph) triples —
    Sesame TriGWriter's shape, the format the reference both parses and
    serves through its RIO registry."""
    rows = df.select(
        term_n3(F.col("s")).alias("s"),
        term_n3(F.col("p")).alias("p"),
        term_n3(F.col("o")).alias("o"),
        (F.col("g") if "g" in df.columns
         else F.lit(None).cast("string")).alias("g"),
    ).collect()
    prefixes = prefixes or {}
    out = [f"@prefix {p}: <{ns}> ." for p, ns in prefixes.items()]
    if out:
        out.append("")
    groups: dict[str | None, list] = {}
    for r in rows:
        groups.setdefault(r["g"], []).append((r["s"], r["p"], r["o"]))
    for g in sorted(groups, key=lambda x: (x is not None, x or "")):
        body = [f"  {s} {p} {o} ." for s, p, o in groups[g]]
        if g is None:
            out.extend(t.strip() for t in body)
        else:
            # same resource rendering as term_n3: bnode graph labels
            # ("_:b…", legal in TriG) print as-is, IRIs bracketed —
            # f"<{g}>" would emit the invalid <_:b…>
            label = g if g.startswith("_:") else f"<{g}>"
            out.append(f"{label} {{")
            out.extend(body)
            out.append("}")
    return "\n".join(out) + "\n"


def rdfjson(df: DataFrame) -> str:
    """RDF/JSON writer (the W3C Note "RDF 1.1 JSON Alternate
    Serialization" — Sesame ships it as sesame-rio-rdfjson, so the
    reference's conneg registry serves it): one top-level key per
    subject (IRI, or "_:label" for bnodes), mapping predicate IRIs to
    arrays of value objects {type, value, lang?, datatype?}."""
    import json as _json

    out: dict = {}
    for r in df.select("s", "p", "o").collect():
        s, p, o = r["s"], r["p"], r["o"]
        skey = f"_:{s['lex']}" if s["kind"] == KIND_BNODE else s["lex"]
        if o["kind"] == KIND_IRI:
            val = {"type": "uri", "value": o["lex"]}
        elif o["kind"] == KIND_BNODE:
            val = {"type": "bnode", "value": f"_:{o['lex']}"}
        else:
            val = {"type": "literal", "value": o["lex"]}
            if o["lang"]:
                val["lang"] = o["lang"]
            elif o["dt"] and o["dt"] != XSD_STRING:
                val["datatype"] = o["dt"]
        out.setdefault(skey, {}).setdefault(p["lex"], []).append(val)
    return _json.dumps(out, indent=1)


def jsonld(df: DataFrame) -> str:
    """JSON-LD writer — EXPANDED, FLATTENED form (no @context; the
    profile Sesame's JSONLDWriter emits by default, which is what the
    reference serves through ConnegUtil's registry,
    ConnegUtil.java:122-144): a top-level array of node objects keyed
    by @id, rdf:type as @type, literals as {"@value", "@language"? ,
    "@type"?} arrays, bnodes as "_:label" ids.  Rows with a non-null
    flat-string ``g`` column group into {"@id": g, "@graph": [...]}
    named-graph objects."""
    import json as _json

    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    has_g = "g" in df.columns
    cols = ["s", "p", "o"] + (["g"] if has_g else [])
    graphs: dict = {}
    for r in df.select(*cols).collect():
        s, p, o = r["s"], r["p"], r["o"]
        g = r["g"] if has_g else None
        skey = f"_:{s['lex']}" if s["kind"] == KIND_BNODE else s["lex"]
        node = graphs.setdefault(g, {}).setdefault(skey, {"@id": skey})
        if p["lex"] == RDF_TYPE and o["kind"] == KIND_IRI:
            node.setdefault("@type", []).append(o["lex"])
            continue
        if o["kind"] == KIND_IRI:
            val = {"@id": o["lex"]}
        elif o["kind"] == KIND_BNODE:
            val = {"@id": f"_:{o['lex']}"}
        else:
            val = {"@value": o["lex"]}
            if o["lang"]:
                val["@language"] = o["lang"]
            elif o["dt"] and o["dt"] != XSD_STRING:
                val["@type"] = o["dt"]
        node.setdefault(p["lex"], []).append(val)
    out: list = []
    default = graphs.pop(None, {})
    out.extend(default[k] for k in sorted(default))
    for g in sorted(graphs):
        out.append({"@id": g,
                    "@graph": [graphs[g][k] for k in sorted(graphs[g])]})
    return _json.dumps(out, indent=1)


def n3(df: DataFrame, prefixes: dict[str, str] | None = None) -> str:
    """Notation3 writer.  Every Turtle document is valid N3 (Turtle is
    N3's RDF-only subset), and for statement-shaped data Sesame's
    N3Writer emits exactly its Turtle serialization — so this delegates
    to :func:`turtle` and exists as the distinct conneg target
    (text/rdf+n3), mirroring ConnegUtil's registry entry."""
    return turtle(df, prefixes=prefixes)


_ROW_WRITERS = {
    "json": json_rows,
    "xml": xml_rows,
    "csv": csv_rows,
    "tsv": tsv_rows,
    "ntriples": ntriples_rows,
    "nquads": nquads_rows,
}

_STRING_WRITERS = {
    "json": sparql_json,
    "xml": sparql_xml,
    "csv": sparql_csv,
    "tsv": sparql_tsv,
    "ntriples": ntriples,
    "turtle": turtle,
    "rdfxml": rdfxml,
    "trix": trix,
    "trig": trig,
    "rdfjson": rdfjson,
    "jsonld": jsonld,
    "n3": n3,
}


def serialize(df: DataFrame, format: str = "json") -> str:
    """One-document serialization (the SPARQL-protocol response body).
    ``format`` is a key of _STRING_WRITERS or a MIME type."""
    fmt = MIME_FORMATS.get(format, format)
    return _STRING_WRITERS[fmt](df)


def write_results(df: DataFrame, path: str, format: str = "json") -> None:
    """Distributed file sink: each partition writes its serialized rows
    with Spark's text writer — no driver collect, any scale."""
    fmt = MIME_FORMATS.get(format, format)
    _ROW_WRITERS[fmt](df).write.mode("overwrite").text(path)


# -- readers ------------------------------------------------------------------
# SPARQL Query Results XML Format reader — the inverse of sparql_xml().
# Mirrors the reference's Sesame SPARQLResultsXMLParser use in
# AbstractDataDrivenSPARQLTestCase.java:299 (expected-result loading).

def parse_sparql_xml(text: str):
    """SPARQL-results XML → bool (ASK envelope) or (vars, rows) where
    rows is a list of {var: Term} dicts (unbound vars absent)."""
    import xml.etree.ElementTree as ET

    from bigdata_old_spark.model import Term

    NS = "{http://www.w3.org/2005/sparql-results#}"
    root = ET.fromstring(text)
    boolean = root.find(f"{NS}boolean")
    if boolean is not None:
        return boolean.text.strip().lower() in ("true", "1")
    head = root.find(f"{NS}head")
    variables = [
        v.get("name") for v in (head.findall(f"{NS}variable") if head is not None else [])
    ]
    rows = []
    results = root.find(f"{NS}results")
    for result in results.findall(f"{NS}result") if results is not None else []:
        row = {}
        for b in result.findall(f"{NS}binding"):
            name = b.get("name")
            for child in b:
                tag = child.tag.removeprefix(NS)
                txt = child.text or ""
                if tag == "uri":
                    row[name] = Term.iri(txt)
                elif tag == "bnode":
                    row[name] = Term.bnode(txt)
                elif tag == "literal":
                    dt = child.get("datatype")
                    lang = child.get("{http://www.w3.org/XML/1998/namespace}lang")
                    row[name] = Term.literal(txt, dt=dt, lang=lang)
        rows.append(row)
    return variables, rows
