"""Extract the reference's data-driven SPARQL fixture manifest.

Scans ``new TestHelper(...)`` invocations in the Java test suites under
``bigdata-rdf/src/test/com/bigdata/rdf/sparql/ast/eval`` (the harness is
``AbstractDataDrivenSPARQLTestCase.java:113`` — TestHelper(testURI,
queryFileURL, dataFileURL(s), resultFileURL[, checkOrder])) and emits a
JSON manifest of (suite, test, query, data[], result, check_order)
entries that ``tests/test_reference_fixtures.py`` parametrizes over.

Only the *file-name tuples* are extracted — no Java code is ported.
Calls whose arguments are not plain string literals (computed names,
variables) are skipped and counted.

Usage: python tools/extract_fixture_manifest.py [REF_EVAL_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import re
import sys

DEFAULT_DIR = (
    "/root/reference/bigdata-rdf/src/test/com/bigdata/rdf/sparql/ast/eval"
)

# Matches one TestHelper invocation's argument list (balanced enough for
# these files: no nested parens inside the literal args we accept).
CALL_RE = re.compile(r"new\s+TestHelper\s*\(", re.S)
STR_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')
METHOD_RE = re.compile(r"public\s+void\s+(test\w+)\s*\(")

DATA_EXT = (".ttl", ".trig", ".nt", ".n3", ".rdf", ".owl", ".nq", ".ttlx")


def _balanced_args(text: str, start: int) -> str | None:
    """Return the argument substring for a call whose '(' is at start-1."""
    depth = 1
    i = start
    in_str = False
    while i < len(text):
        c = text[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[start:i]
        i += 1
    return None


def extract_file(path: str) -> tuple[list[dict], int]:
    suite = os.path.splitext(os.path.basename(path))[0]
    with open(path, encoding="utf-8", errors="replace") as f:
        src = f.read()
    entries: list[dict] = []
    skipped = 0
    # map call position -> enclosing test method name
    methods = [(m.start(), m.group(1)) for m in METHOD_RE.finditer(src)]
    for m in CALL_RE.finditer(src):
        args = _balanced_args(src, m.end())
        if args is None:
            skipped += 1
            continue
        # strip comments inside the arg list
        args_nc = re.sub(r"//[^\n]*", "", args)
        args_nc = re.sub(r"/\*.*?\*/", "", args_nc, flags=re.S)
        strs = [s.group(1) for s in STR_RE.finditer(args_nc)]
        # reject calls that reference variables/concat (a bare identifier
        # adjacent to the arg commas other than new String[]{...}/booleans)
        residue = STR_RE.sub("", args_nc)
        residue = re.sub(r"new\s+String\s*\[\s*\]\s*\{|\}", "", residue)
        residue = re.sub(r"true|false|null", "", residue)
        residue = re.sub(r"[\s,()]+", "", residue)
        if residue or not strs:
            skipped += 1
            continue
        test_uri = strs[0]
        query = next((s for s in strs if s.endswith(".rq")), None)
        result = next(
            (
                s
                for s in strs[1:]
                if s.endswith(".srx")
                or "result" in s
                or (query and s != query and s == strs[-1] and s.endswith(DATA_EXT))
            ),
            None,
        )
        if query is None:
            # TestHelper(testURI) default-expands
            query, datas, result = (
                test_uri + ".rq",
                [test_uri + ".trig"],
                test_uri + ".srx",
            )
        else:
            datas = [
                s
                for s in strs[1:]
                if s.endswith(DATA_EXT) and s != result and s != query
            ]
        check_order = bool(re.search(r"\btrue\s*(?:/\*\s*checkOrder\s*\*/)?\s*$", args_nc.strip())) and "checkOrder" in args
        method = ""
        for pos, name in methods:
            if pos < m.start():
                method = name
            else:
                break
        entries.append(
            {
                "suite": suite,
                "method": method,
                "uri": test_uri,
                "query": query,
                "data": datas,
                "result": result,
                "check_order": check_order,
            }
        )
    return entries, skipped


#: TestHelper calls the literal-string scanner cannot see.
#:
#: - TestTwoPropertyPaths734.java:87-101 builds file names by string
#:   concatenation inside two private helpers
#:   (property_path_test / property_path_using_workaround_test); the
#:   call sites pass "none"/"first"/"second"/"both"/"workaroundN".
#: - named-graphs-8-3-{2,3}: the W3C spec-§8.3.2/8.3.3 fixture files
#:   ship complete (rq/trig/srx) but TestNamedGraphs.java:367,458
#:   re-runs the 8-3-1 file tuple under those method names (a
#:   copy/paste slip in the reference) — run the files as authored.
SUPPLEMENT: list[dict] = (
    [
        {
            "suite": "TestTwoPropertyPaths734",
            "method": f"test_{n}_property_path",
            "uri": f"property-path-734-{n}",
            "query": f"property-path-734-{n}.rq",
            "data": ["property-path-734.ttl"],
            "result": "property-path-734.srx",
            "check_order": False,
        }
        for n in ("none", "first", "second", "both")
    ]
    + [
        {
            "suite": "TestTwoPropertyPaths734",
            "method": f"test_{n}_using_workaround_property_path",
            "uri": f"property-path-734-B-{n}",
            "query": f"property-path-734-B-{n}.rq",
            "data": ["property-path-734-B.ttl"],
            "result": "property-path-734-B.srx",
            "check_order": False,
        }
        for n in ("none", "first", "second", "both", "workaround2", "workaround3", "workaround4")
    ]
    + [
        {
            "suite": "TestNamedGraphs",
            "method": f"test_8_3_{i}",
            "uri": f"named-graphs-8-3-{i}",
            "query": f"named-graphs-8-3-{i}.rq",
            "data": [f"named-graphs-8-3-{i}.trig"],
            "result": f"named-graphs-8-3-{i}.srx",
            "check_order": False,
        }
        for i in (2, 3)
    ]
)

#: suites outside the eval dir whose fixture files resolve INTO it
#: (TestHelper resolves resources against the
#: AbstractDataDrivenSPARQLTestCase package, i.e. the eval dir)
EXTRA_SUITES = ["service/TestSearch.java"]


def main() -> None:
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DIR
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "tests", "fixture_manifest.json")
    )
    all_entries: list[dict] = []
    total_skipped = 0
    scan = [
        fn
        for fn in sorted(os.listdir(ref_dir))
        if fn.startswith("Test") and fn.endswith(".java")
    ] + [p for p in EXTRA_SUITES if os.path.exists(os.path.join(ref_dir, p))]
    for fn in scan:
        entries, skipped = extract_file(os.path.join(ref_dir, fn))
        total_skipped += skipped
        for e in entries + [s for s in SUPPLEMENT if f"{s['suite']}.java" == fn]:
            # only keep entries whose files all exist on disk
            need = [e["query"]] + e["data"] + ([e["result"]] if e["result"] else [])
            if all(os.path.exists(os.path.join(ref_dir, p)) for p in need):
                all_entries.append(e)
            else:
                total_skipped += 1
    # de-dup (same tuple may be invoked from several suites)
    seen = set()
    uniq = []
    for e in all_entries:
        k = (e["query"], tuple(e["data"]), e["result"])
        if k not in seen:
            seen.add(k)
            uniq.append(e)
    with open(out, "w") as f:
        json.dump({"ref_dir": ref_dir, "entries": uniq}, f, indent=1)
    print(f"wrote {len(uniq)} entries ({len(all_entries)} raw, {total_skipped} skipped) -> {out}")


if __name__ == "__main__":
    main()
