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

SF_DIR = "/root/testdata/sf0.01"
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


ALL_QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle(spark, ddb, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only smoke
        assert spark_cols
        return
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
