"""[MS-OLEPS] property sets: round-trip vectors, FILETIME integer
date math, codepage handling, golden pin, Spark parity, fuzz."""

import random
import struct

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import olepsx

GOLDEN = "fixtures/golden_oleps_seed42_n6.parquet"


def test_roundtrip_all_types():
    ps = olepsx.build_property_set([
        (2, "lpstr", "Quarterly report"),
        (4, "lpwstr", "Ana Gómez"),
        (12, "filetime", "2003-05-17T09:30:00Z"),
        (14, "i4", -12),
        (9, "i2", 7),
        (11, "bool", True),
    ])
    rows = olepsx.parse_property_set(ps, olepsx.SUMMARY_IDS)
    vals = {pid: (vt, v) for (_p, pid, _n, vt, v) in rows}
    assert vals[2] == ("lpstr", "Quarterly report")
    assert vals[4] == ("lpwstr", "Ana Gómez")
    assert vals[12] == ("filetime", "2003-05-17T09:30:00Z")
    assert vals[14] == ("i4", "-12")
    assert vals[9] == ("i2", "7")
    assert vals[11] == ("bool", "true")
    # names resolve from the summary table; unknown ids keep None
    assert rows[0][2] == "title"


def test_filetime_integer_math():
    # epoch boundary + leap-year day, cross-checked against datetime
    import datetime as dt
    for iso in ("1970-01-01T00:00:00Z", "2000-02-29T12:00:00Z",
                "2024-10-27T06:00:01Z", "1999-12-31T23:59:59Z"):
        d = dt.datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ")
        ticks = (int(d.replace(
            tzinfo=dt.timezone.utc).timestamp())
            + olepsx._EPOCH_DELTA) * 10_000_000
        assert olepsx._filetime_iso(ticks) == iso
    assert olepsx._filetime_iso(0) is None
    assert olepsx._filetime_iso(1) is None          # pre-1970 clamp


def test_extract_from_cfb_fixtures():
    by = {r["url"].rsplit("/", 1)[1]: r["payload"]
          for r in fixtures.cfb_file_rows()}
    props = olepsx.extract_office_properties(by["deck.ppt"])
    named = {(s, n): v for (_p, s, _i, n, _t, v) in props}
    assert named[("summary", "title")] == "Quarterly crawl report"
    assert named[("summary", "author")] == "Ana Gómez"
    assert named[("docsummary", "n_slides")] == "2"
    assert named[("docsummary", "company")] == "Example Org"
    # doc without property streams / junk -> []
    assert olepsx.extract_office_properties(by["note.doc"]) == []
    assert olepsx.extract_office_properties(by["junk.bin"]) == []
    assert olepsx.extract_office_properties(None) == []


def test_wrong_byte_order_rejected():
    ps = bytearray(olepsx.build_property_set([(2, "lpstr", "x")]))
    struct.pack_into("<H", ps, 0, 0xFEFF)
    assert olepsx.parse_property_set(bytes(ps),
                                     olepsx.SUMMARY_IDS) == []


def _pure():
    out = []
    for r in fixtures.cfb_file_rows():
        for (pos, stream, pid, name, vtype, val) in \
                olepsx.extract_office_properties(r["payload"]):
            out.append((r["url"], pos, stream, pid, name, vtype,
                        val))
    return out


def test_match_committed_golden():
    got = [tuple(r.values())
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 14


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.cfb_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted(tuple(r) for r in
                 sources.read_office_properties(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(65)
    base = olepsx.build_property_set([
        (2, "lpstr", "t"), (12, "filetime", "2003-05-17T09:30:00Z")])
    for _ in range(200):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        assert isinstance(
            olepsx.parse_property_set(blob, {}), list)
    for i in range(len(base)):
        olepsx.parse_property_set(base[:i], {})
        mut = bytearray(base)
        mut[i] ^= 0xFF
        olepsx.parse_property_set(bytes(mut), {})
