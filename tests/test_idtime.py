"""ID-time family: stdlib-uuid parity, window edges, Spark==pure."""

import random
import uuid as uuidlib

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import \
    idtimex


def test_uuid1_matches_stdlib_clock():
    rng = random.Random(31)
    for _ in range(200):
        ticks = idtimex.GREGORIAN_OFFSET_100NS + rng.randrange(
            0, (1 << 60) - idtimex.GREGORIAN_OFFSET_100NS)
        u = uuidlib.UUID(fields=(
            ticks & 0xFFFFFFFF, (ticks >> 32) & 0xFFFF,
            ((ticks >> 48) & 0x0FFF) | 0x1000,
            0x91, 0x34, rng.randrange(1 << 48)))
        kind, ms = idtimex.classify_id(str(u))
        assert kind == "uuid1"
        assert u.time == ticks
        assert ms == (u.time - idtimex.GREGORIAN_OFFSET_100NS) \
            // 10000


def test_fixture_vectors():
    ids = fixtures.id_sample_rows()
    got = [idtimex.classify_id(s) for s in ids]
    assert got[0] == ("uuid1", 1083827289123)
    assert got[1] == ("uuid1", 1700000000000)     # uppercase hex
    assert got[2] == ("uuid1", None)              # pre-1970 clock
    assert got[3] == ("uuid4", None)
    assert got[4] == ("uuid7", 1709251200000)
    assert got[6] == ("uuid", None)               # v5
    assert got[7] == ("ulid", 1469922850259)      # spec example
    assert got[8] == ("ulid", 1700000000000)
    assert got[9] == ("unknown", None)            # lowercase ulid
    assert got[10] == ("unknown", None)           # 8-leading ulid
    assert got[11] == ("snowflake", 1656432460105)
    assert got[12] == ("int", None)               # pre-window
    assert got[13] == ("snowflake", 1420070400000)  # window edge in
    assert got[14] == ("int", None)               # one tick below
    assert got[15] == ("int", None)               # int64 max
    assert got[16] == ("unknown", None)           # 20 digits
    assert got[17:] == [("unknown", None)] * 2 + [(None, None)]


def test_spark_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark.operators import \
        idtime
    rng = random.Random(32)
    ids = list(fixtures.id_sample_rows())
    hexd = "0123456789abcdefABCDEF"
    for _ in range(120):
        r = rng.random()
        if r < 0.4:
            ids.append("-".join(
                "".join(rng.choice(hexd) for _ in range(n))
                for n in (8, 4, 4, 4, 12)))
        elif r < 0.6:
            ids.append("".join(
                rng.choice(idtimex.CROCKFORD)
                for _ in range(rng.choice([25, 26, 27]))))
        elif r < 0.8:
            ids.append(str(rng.randrange(10 ** 21)))
        else:
            ids.append("".join(
                rng.choice("abz019-_ ") for _ in range(8)))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ids)],
        "pos int, id string").repartition(8)
    got = {r["pos"]: (r["kind"], r["ts_ms"])
           for r in idtime.classify_ids(df).collect()}
    for i, s in enumerate(ids):
        assert got[i] == idtimex.classify_id(s), (i, s)
