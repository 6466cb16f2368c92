"""JWT structure parsing — the distributed side of
``extractor/jwtx.py``.

One STAGE GENERATOR, two dialects (the idtime pattern):
:func:`jwt_stages` yields (column, sql_fragment) pairs referencing
earlier columns by name; Spark applies them as chained
``withColumn`` (map-only codegen), the DuckDB twin wraps the same
chain as CTE stages. Dialect differences: split (Spark regex split
with limit -1 to KEEP trailing empties — the unsecured-JWT form
ends in '.'), element access, base64 decode, and the
"is JSON object" / keys probes (Spark ``json_object_keys`` is NULL
for any non-object; DuckDB gates ``json_type = 'OBJECT'``). Every
decode is CASE-guarded behind the base64url gate — DuckDB
``from_base64``/``decode`` THROW on bad input where Spark is
lenient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractor.jwtx import B64URL_RE, DIGITS_RE, JWT_AS_OF


def jwt_stages(tok: str, dialect: str = "spark"
               ) -> list[tuple[str, str]]:
    """Ordered (name, expr) stages from token expression ``tok`` to
    the FIELDS columns of jwtx.parse_jwt."""
    if dialect == "spark":
        parts = f"split({tok}, '[.]', -1)"

        def item(i: int) -> str:
            return f"try_element_at(__parts, {i})"

        def dec(x: str) -> str:
            return f"cast(unbase64({x}) as string)"

        def isobj(d: str) -> str:
            return f"(json_object_keys({d}) IS NOT NULL)"

        def nkeys(d: str) -> str:
            return f"size(json_object_keys({d}))"

        def claim(d: str, k: str) -> str:
            return f"get_json_object({d}, '$.{k}')"

        def matches(e: str, re_: str) -> str:
            return f"({e} rlike '{re_}')"
    else:
        parts = f"string_split({tok}, '.')"

        def item(i: int) -> str:
            return f"list_extract(__parts, {i})"

        def dec(x: str) -> str:
            return f"decode(from_base64({x}))"

        def isobj(d: str) -> str:
            # CASE, not AND: DuckDB AND does not short-circuit in
            # vectorized execution, and the ::JSON cast throws
            return (f"(CASE WHEN json_valid({d}) THEN "
                    f"json_type({d}::JSON) END = 'OBJECT')")

        def nkeys(d: str) -> str:
            return f"len(json_keys({d}))"

        def claim(d: str, k: str) -> str:
            return f"json_extract_string({d}, '$.{k}')"

        def matches(e: str, re_: str) -> str:
            return f"regexp_matches({e}, '{re_}')"

    def b64ok(p: str) -> str:
        return (f"({p} != '' AND {matches(p, B64URL_RE)} "
                f"AND length({p}) % 4 != 1)")

    def padded(p: str) -> str:
        return (f"(translate({p}, '-_', '+/') || "
                f"repeat('=', (4 - length({p}) % 4) % 4))")

    def sclaim(d: str, k: str) -> str:
        return f"CASE WHEN __wf THEN {claim(d, k)} END"

    def nclaim(d: str, k: str) -> str:
        c = claim(d, k)
        return (f"CASE WHEN __wf AND {matches(c, DIGITS_RE)} "
                f"THEN try_cast({c} AS bigint) END")

    return [
        ("__parts", parts),
        ("__np", "size(__parts)" if dialect == "spark"
         else "len(__parts)"),
        ("__p1", item(1)), ("__p2", item(2)), ("__p3", item(3)),
        ("__ok", (f"(__np = 3 AND {b64ok('__p1')} AND "
                  f"{b64ok('__p2')} AND "
                  f"(__p3 = '' OR {b64ok('__p3')}))")),
        ("__hdr", f"CASE WHEN __ok THEN {dec(padded('__p1'))} END"),
        ("__pay", f"CASE WHEN __ok THEN {dec(padded('__p2'))} END"),
        ("__wf", f"(__ok AND {isobj('__hdr')} AND {isobj('__pay')})"),
        ("well_formed", f"CASE WHEN {tok} IS NULL THEN NULL "
                        f"ELSE coalesce(__wf, FALSE) END"),
        ("alg", sclaim("__hdr", "alg")),
        ("typ", sclaim("__hdr", "typ")),
        ("kid", sclaim("__hdr", "kid")),
        ("iss", sclaim("__pay", "iss")),
        ("sub", sclaim("__pay", "sub")),
        ("exp", nclaim("__pay", "exp")),
        ("iat", nclaim("__pay", "iat")),
        ("expired", f"CASE WHEN exp IS NOT NULL "
                    f"THEN exp < {JWT_AS_OF} END"),
        ("n_claims", f"CASE WHEN __wf THEN {nkeys('__pay')} END"),
        ("sig_chars", "CASE WHEN __wf THEN length(__p3) END"),
    ]


def parse_jwt_df(df: DataFrame, tok_col: str = "token"
                 ) -> DataFrame:
    out = df
    for name, expr in jwt_stages(tok_col, "spark"):
        out = out.withColumn(name, F.expr(expr))
    return out.drop("__parts", "__np", "__p1", "__p2", "__p3",
                    "__ok", "__hdr", "__pay", "__wf")


def jwt_twin_cte(src: str, tok: str = "token") -> str:
    """DuckDB CTE chain ending in ``jwt`` (pos, token + FIELDS),
    built from the SAME stages."""
    stages = jwt_stages(tok, "duckdb")
    ctes, prev = [], src
    for i, (name, expr) in enumerate(stages):
        ctes.append(f"jw{i} AS (SELECT *, {expr} AS {name} "
                    f"FROM {prev})")
        prev = f"jw{i}"
    keep = [n for n, _ in stages if not n.startswith("__")]
    return (",\n        ".join(ctes)
            + f",\n        jwt AS (SELECT pos, {tok}, "
            + ", ".join(keep) + f" FROM {prev})")
