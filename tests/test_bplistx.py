"""Apple binary plist family: plistlib parity (independent
flattener), date/UID/count-escape vectors, golden pin, Spark
parity, fuzz."""

import datetime as dt
import plistlib
import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import bplistx

GOLDEN = "fixtures/golden_bplist_seed42_n8.parquet"


def _flatten_ref(v, path=""):
    """Independent reference flattener over plistlib's parse."""
    out = []
    if isinstance(v, dict):
        if not v:
            return [(path, None)]
        for k in sorted(v, key=str):
            kk = k if bplistx._BARE.fullmatch(str(k)) \
                else f'"{k}"'
            child = f"{path}.{kk}" if path else kk
            out += _flatten_ref(v[k], child)
        return out
    if isinstance(v, list):
        if not v:
            return [(path, None)]
        for i, x in enumerate(v):
            out += _flatten_ref(x, f"{path}[{i}]")
        return out
    return [(path, v)]


def test_parity_with_plistlib():
    """Every leaf plistlib sees, we see at the same path with the
    same rendered value (the tomllib-parity discipline)."""
    for r in fixtures.bplist_blob_rows():
        try:
            ref = plistlib.loads(r["payload"],
                                 fmt=plistlib.FMT_BINARY)
        except Exception:
            assert not bplistx.parse_bplist(r["payload"])["ok"]
            continue
        d = bplistx.parse_bplist(r["payload"])
        assert d["ok"]
        got = {row[1]: (row[2], row[3]) for row in d["rows"]}
        for path, val in _flatten_ref(ref):
            assert path in got, path
            vt, txt = got[path]
            if isinstance(val, bool):
                assert txt == ("true" if val else "false")
            elif isinstance(val, int) and not isinstance(val, bool):
                if vt == "uid":
                    continue
                assert txt == str(val)
            elif isinstance(val, float):
                assert txt == repr(val)
            elif isinstance(val, str):
                assert txt == val
            elif isinstance(val, bytes):
                assert txt.startswith(("h'", "bytes:"))
            elif isinstance(val, dt.datetime):
                if val.microsecond == 0:
                    assert txt == val.strftime(
                        "%Y-%m-%dT%H:%M:%SZ")
            elif isinstance(val, plistlib.UID):
                assert vt == "uid" and txt == str(val.data)


def test_date_and_uid_vectors():
    by = {r["url"].rsplit("/", 1)[1]: r["payload"]
          for r in fixtures.bplist_blob_rows()}
    rows = bplistx.parse_bplist(by["dates.plist"])["rows"]
    vals = {p: (t, v) for (_i, p, t, v) in rows}
    assert vals["midnight"] == ("date", "2001-01-01T00:00:00Z")
    assert vals["frac"] == ("date", "604648800.25")  # exact double
    assert bplistx.parse_bplist(by["uid.plist"])["rows"] == [
        (0, "ref", "uid", "7")]
    # >14-element array uses the count-escape int object
    wide = bplistx.parse_bplist(by["wide.plist"])
    assert wide["ok"]
    assert sum(1 for r in wide["rows"]
               if r[1].startswith("xs[")) == 20
    assert any(r[3] == "café — ünïcode" for r in wide["rows"])


def test_rejects():
    by = {r["url"].rsplit("/", 1)[1]: r["payload"]
          for r in fixtures.bplist_blob_rows()}
    assert not bplistx.parse_bplist(by["cut.plist"])["ok"]
    assert not bplistx.parse_bplist(by["junk.plist"])["ok"]
    assert not bplistx.parse_bplist(None)["ok"]
    # hand-built ref cycle: object 0 is an array pointing at itself
    blob = (b"bplist00"
            + b"\xa1\x00"              # array(1) -> ref 0
            + b"\x08"                  # offset table: obj0 at 8
            + b"\x00" * 5 + b"\x00"    # trailer head
            + bytes([1, 1])            # off_sz, ref_sz
            + (1).to_bytes(8, "big")   # numObjects
            + (0).to_bytes(8, "big")   # topObject
            + (10).to_bytes(8, "big"))  # table offset
    assert not bplistx.parse_bplist(blob)["ok"]


def _pure():
    out = []
    for r in fixtures.bplist_blob_rows():
        d = bplistx.parse_bplist(r["payload"])
        if not d["ok"]:
            out.append((r["url"], 0, False, None, None, None))
            continue
        for (pos, path, vtype, text) in d["rows"]:
            out.append((r["url"], pos, True, path, vtype, text))
    return out


def test_match_committed_golden():
    got = [tuple(r.values())
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 44


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.bplist_blob_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_bplist_records(df).collect()),
                 key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(67)
    real = [r["payload"] for r in fixtures.bplist_blob_rows()
            if len(r["payload"]) > 40]
    for _ in range(200):
        blob = b"bplist00" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 120)))
        assert isinstance(
            bplistx.parse_bplist(blob)["rows"], list)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        bplistx.parse_bplist(
            bytes(base[:rng.randrange(0, len(base) + 1)]))
