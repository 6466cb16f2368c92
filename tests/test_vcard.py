"""vCard source: grammar vectors, golden pin, Spark reader parity,
never-raise fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import vcardx

GOLDEN_VCARDS = "fixtures/golden_vcards_seed42_n16.parquet"


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.vcf_file_rows(n):
        for c in vcardx.parse_vcards(r["payload"]):
            for p in c["props"]:
                out.append((r["url"], c["idx"]) + p)
    return out


def test_vectors():
    raw = vcardx.build_vcard([[
        "VERSION:3.0",
        "FN:Ada Lovelace",
        "EMAIL;TYPE=INTERNET;TYPE=WORK:ada@e.example",
        'TEL;TYPE="cell,voice":+1 555',
        "TEL;HOME;VOICE:555-0100",        # 2.1 bare params
        "item2.X-SOCIAL:@ada",            # group prefix
        "NOTE:a\\nb\\,c\\;d\\\\e",
        "BADLINE-WITHOUT-COLON",          # skipped
    ]])
    (card,) = vcardx.parse_vcards(raw)
    props = {p[2]: p for p in card["props"]}
    # repeated TYPE= params merge in encounter order
    assert props["EMAIL"][3] == "internet,work"
    # quoted comma-list and bare tokens both normalize
    tels = [p for p in card["props"] if p[2] == "TEL"]
    assert [t[3] for t in tels] == ["cell,voice", "home,voice"]
    assert props["X-SOCIAL"][1] == "item2"
    assert props["NOTE"][4] == "a\nb,c;d\\e"
    assert "BADLINE-WITHOUT-COLON" not in props
    # positions consecutive despite the skipped line
    assert [p[0] for p in card["props"]] == list(range(7))
    # folding round-trips regardless of split point
    long_line = "NOTE:" + "x" * 500
    raw2 = vcardx.build_vcard([[long_line]], width=20)
    (c2,) = vcardx.parse_vcards(raw2)
    assert c2["props"][0][4] == "x" * 500
    # unterminated trailing card dropped
    assert vcardx.parse_vcards(
        raw + b"BEGIN:VCARD\r\nFN:T\r\n") == vcardx.parse_vcards(raw)
    assert vcardx.parse_vcards(None) == []
    assert vcardx.parse_vcards(b"") == []


def test_matches_committed_golden():
    golden = [(r["url"], r["card"], r["pos"], r["grp"], r["name"],
               r["types"], r["value"])
              for r in pq.read_table(GOLDEN_VCARDS).to_pylist()]
    assert golden == _pure_rows(16)
    assert len(golden) == 116


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.vcf_file_rows(16)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_vcard_props(df).collect())
    want = sorted(tuple(str(x) for x in r) for r in _pure_rows(16))
    assert got == want


def test_fuzz_never_raises():
    rng = random.Random(9)
    base = fixtures.vcf_file_rows(2)[0]["payload"]
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 200)))
        assert isinstance(vcardx.parse_vcards(blob), list)
    for i in range(0, len(base), 11):
        vcardx.parse_vcards(base[:i])
