"""V1 → V2 recipe migration (parity: ``wrangler-core/.../parser/
MigrateToV2.java`` — rewrites legacy space-separated syntax into V2's
``:col`` refs, quoted text and ``exp:{}`` blocks).

Table-driven: each V1 directive maps to a slot-kind signature. Kinds:
  col     bare column name        → :name
  cols    comma list of columns   → :a,:b
  text    free token              → 'token'
  num     numeric token           → unchanged
  ident   keyword token           → unchanged
  rest-expr  remainder of line    → exp:{ ... }
  rest-text  remainder of line    → '...'
Pipeline.compile tries V2 first and falls back to migration, like the
reference which always runs migrate() before compiling.
"""

from __future__ import annotations

import shlex

_SIGS: dict[str, list[str]] = {
    "rename": ["col", "col"],
    "set-type": ["col", "ident", "num?"],
    "drop": ["cols"],
    "keep": ["cols"],
    "merge": ["col", "col", "col", "text"],
    "uppercase": ["col"], "lowercase": ["col"], "titlecase": ["col"],
    "trim": ["col"], "ltrim": ["col"], "rtrim": ["col"],
    "indexsplit": ["col", "num", "num", "col"],
    "split": ["col", "text", "col", "col"],
    "filter-row-if-matched": ["col", "rest-text"],
    "filter-row-if-not-matched": ["col", "rest-text"],
    "set-variable": ["ident", "rest-expr"],
    "increment-variable": ["ident", "num", "rest-expr"],
    "mask-number": ["col", "text"],
    "mask-shuffle": ["col"],
    "format-date": ["col", "rest-text"],
    "quantize": ["col", "col", "ranges"],
    "find-and-replace": ["col", "rest-text"],
    "parse-as-csv": ["col", "text", "bool?"],
    "parse-as-json": ["col", "num?"],
    "json-path": ["col", "col", "rest-text"],
    "set-charset": ["col", "text"],
    "set-record-delim": ["col", "text", "num?"],
    "parse-as-fixed-length": ["col", "numlist", "text?"],
    "split-to-rows": ["col", "rest-text"],
    "split-to-columns": ["col", "rest-text"],
    "parse-xml-to-json": ["col", "num?"],
    "flatten": ["cols"],
    "copy": ["col", "col", "bool?"],
    "fill-null-or-empty": ["col", "rest-text"],
    "cut-character": ["col", "col", "rest-text"],
    "generate-uuid": ["col"],
    "url-encode": ["col"], "url-decode": ["col"],
    "parse-as-log": ["col", "rest-text"],
    "parse-as-date": ["col", "text?"],
    "parse-as-simple-date": ["col", "rest-text"],
    "diff-date": ["col", "col", "col"],
    "parse-as-hl7": ["col", "num?"],
    "split-email": ["col"],
    "swap": ["col", "col"],
    "hash": ["col", "ident", "bool?"],
    "write-as-json-map": ["col"],
    "write-as-json-object": ["col", "cols"],
    "write-as-csv": ["col"],
    "parse-as-excel": ["col", "text?", "bool?"],
    "parse-as-avro-file": ["col"],
    "stemming": ["col"],
    "parse-as-currency": ["col", "col", "text?"],
    "format-as-currency": ["col", "col", "text?"],
    "text-distance": ["ident", "col", "col", "col"],
    "text-metric": ["ident", "col", "col", "col"],
    "catalog-lookup": ["ident", "col"],
    "table-lookup": ["col", "text"],
    "fill-null-or-empty": ["col", "rest-text"],
    "extract-regex-groups": ["col", "rest-text"],
    "split-url": ["col"],
    "cleanse-column-names": [],
    "change-column-case": ["ident?"],
    "columns-replace": ["rest-text"],
    "set-headers": ["cols"],
    "encode": ["ident", "col"],
    "decode": ["ident", "col"],
}


def migrate_statement(stmt: str) -> str | None:
    """Rewrite one V1 statement to V2, or None if not migratable."""
    stmt = stmt.strip()
    if not stmt:
        return None
    try:
        parts = shlex.split(stmt, posix=False)
    except ValueError:
        return None
    if not parts:
        return None
    name = parts[0].lower()
    args = parts[1:]

    # V1 bare "set-column <col> <expr>" (no ':', unwrapped expression —
    # the form the reference's own function tests use, MigrateToV2.java)
    if name == "set-column" and len(args) >= 2 and not args[0].startswith(":"):
        expr = stmt.split(None, 2)[2]
        if not expr.lstrip().startswith("exp:{"):
            return f"set-column :{args[0]} exp:{{ {expr} }}"
    # "set column <col> <expr>" / "set columns <c1,c2,..>" (V1 'set')
    if name == "set" and args:
        if args[0] == "column" and len(args) >= 3:
            # keep the expression remainder VERBATIM — shlex re-joining
            # would strip quotes inside it (e.g. concat(a, ", ", b))
            expr = stmt.split(None, 3)[3]
            return f"set-column :{args[1]} exp:{{ {expr} }}"
        if args[0] == "columns" and len(args) >= 2:
            cols = ",".join(f":{c.strip()}" for c in " ".join(args[1:]).split(",") if c.strip())
            return f"set-headers {cols}"
        if args[0] == "format":
            return None
    if name == "filter-row-if-true" and args:
        return f"filter-row exp:{{ {' '.join(_unq(a) for a in args)} }} true"
    if name == "filter-row-if-false" and args:
        return f"filter-row exp:{{ {' '.join(_unq(a) for a in args)} }} false"
    if name == "filter-row-if-matched" and len(args) >= 2:
        return f"filter-by-regex if-matched :{args[0]} '{_unq(' '.join(args[1:]))}'"
    if name == "filter-row-if-not-matched" and len(args) >= 2:
        return f"filter-by-regex if-not-matched :{args[0]} '{_unq(' '.join(args[1:]))}'"

    sig = _SIGS.get(name)
    if sig is None:
        return None
    out = [name]
    i = 0
    for slot in sig:
        optional = slot.endswith("?")
        kind = slot.rstrip("?")
        if i >= len(args):
            if optional or kind.startswith("rest"):
                continue
            return None
        if kind == "col":
            out.append(":" + _unq(args[i]).lstrip(":"))
            i += 1
        elif kind == "cols":
            cols = " ".join(args[i:]) if slot is sig[-1] else args[i]
            items = [c.strip().lstrip(":") for c in cols.split(",") if c.strip()]
            out.append(",".join(f":{c}" for c in items))
            i = len(args) if slot is sig[-1] else i + 1
        elif kind == "text":
            out.append(_quote(_unq(args[i])))
            i += 1
        elif kind in ("num", "numlist", "ranges", "ident", "bool"):
            out.append(_unq(args[i]))
            i += 1
        elif kind == "rest-text":
            out.append(_quote(_unq(" ".join(args[i:]))))
            i = len(args)
        elif kind == "rest-expr":
            out.append(f"exp:{{ {' '.join(_unq(a) for a in args[i:])} }}")
            i = len(args)
    if i < len(args):
        return None
    return " ".join(out)


def _unq(s: str) -> str:
    if len(s) >= 2 and s[0] in "'\"" and s[-1] == s[0]:
        return s[1:-1]
    return s


def _quote(s: str) -> str:
    """Quote a migrated text token; date formats like yyyy-MM-dd'T'HH:mm:ss
    contain single quotes, so fall back to double quotes (and escape) when
    needed."""
    if "'" not in s:
        return f"'{s}'"
    if '"' not in s:
        return f'"{s}"'
    return "'" + s.replace("'", "\\'") + "'"
