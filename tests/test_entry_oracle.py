"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 and compare against its DuckDB oracle
(row count + sorted-column values). Rows-only queries are checked for
schema stability and rows >= 0.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

# sf0.01 default (fast); the driver checks sf0.1 — override with
# SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.1 for the full-scale
# replica pass (VERDICT r4 task 3; tools/oracle_replica.py runs the
# stricter value-hash version and writes a CORRECTNESS-style JSON)
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                        "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def _spark_type_key(ts: str) -> str:
    """Normalize a Spark simpleString type to a comparable key."""
    if ts.startswith("array<") and ts.endswith(">"):
        return f"list<{_spark_type_key(ts[6:-1])}>"
    return {
        "bigint": "i", "int": "i", "smallint": "i", "tinyint": "i",
        "double": "f", "float": "f", "string": "str", "boolean": "bool",
        "binary": "bin", "date": "date",
    }.get(ts, "ts" if ts.startswith("timestamp") else ts)


def _arrow_type_key(t) -> str:
    """Normalize a pyarrow type to the same key space as _spark_type_key."""
    import pyarrow as pa
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_key(t.value_type)}>"
    # DuckDB DECIMAL (incl. HUGEINT = decimal128(38,0)) lands as float64
    # through the driver's pandas conversion — class-match against Spark
    # doubles, but flag it against Spark integer columns (the HUGEINT trap).
    if pa.types.is_decimal(t):
        return "f"
    if pa.types.is_integer(t):
        return "i"
    if pa.types.is_floating(t):
        return "f"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    return str(t)


def _assert_type_parity(name, sdf, ddb, oracle):
    """Mirror the driver's TYPED value-hash: a DuckDB HUGEINT / INTEGER
    aggregate vs a Spark LONG hashes differently even when str() values
    match, so assert normalized type equality per column up front."""
    o_schema = ddb.execute(
        f"SELECT * FROM ({oracle}) __q LIMIT 0").fetch_arrow_table().schema
    o_types = {f.name: _arrow_type_key(f.type) for f in o_schema}
    s_types = {f.name: _spark_type_key(f.dataType.simpleString())
               for f in sdf.schema.fields}
    assert o_types == s_types, (
        f"{name}: oracle column types {o_types} != spark {s_types} "
        f"(an untyped str() compare would hide this; cast the oracle, "
        f"e.g. sum(x)::bigint)")


def _approx_equal(a, b):
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, f"width {ra} vs {rb}"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                if not math.isclose(float(va), float(vb),
                                    rel_tol=1e-9, abs_tol=1e-6):
                    return False, f"value {va} vs {vb} in {ra}"
            elif str(va) != str(vb):
                return False, f"value {va!r} vs {vb!r} in {ra}"
    return True, ""


ALL_QUERIES = sorted({**entrymod.queries(),
                      **entrymod.extra_queries()}.keys())


def test_driver_window_cap():
    """The correctness driver checks at most 50 queries: queries() must
    expose exactly 50 so NOTHING registered goes unverified (extras are
    pytest-checked here instead)."""
    assert len(entrymod.queries()) == 50
    assert not set(entrymod.queries()) & set(entrymod.extra_queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle(spark, ddb, name):
    qfn = {**entrymod.queries(), **entrymod.extra_queries()}[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only smoke
        assert spark_cols
        return
    _assert_type_parity(name, sdf, ddb, oracle)
    res = ddb.execute(oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(o_cols) == spark_cols, (
        f"{name}: columns {sorted(o_cols)} vs {spark_cols}")
    a = _normalize(spark_rows, sdf.columns)
    b = _normalize(o_rows, o_cols)
    ok, why = _approx_equal(a, b)
    assert ok, f"{name}: {why} (spark={len(a)} oracle={len(b)} rows)"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 300
    assert {r.doc_kind for r in rows} == {"html", "pdf", "empty"}
