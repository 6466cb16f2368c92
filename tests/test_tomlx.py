"""TOML family: tomllib parity (fixtures + generated sweep), the
documented multiline gap, golden pin, Spark parity, fuzz."""

import random
import tomllib

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import tomlx

GOLDEN = "fixtures/golden_toml_seed42_n10.parquet"
COLS = ["pos", "ok", "key_path", "vtype", "value_text"]


def _agree(src: str, allow_gap: bool = False) -> None:
    mine = tomlx.parse_toml(src)
    try:
        ref = tomllib.loads(src)
        ref_ok = True
    except Exception:
        ref, ref_ok = None, False
    if allow_gap and not mine["ok"] and ref_ok:
        return  # documented multiline gap: we reject, tomllib parses
    assert mine["ok"] == ref_ok, src
    if ref_ok:
        assert tomlx.flatten(mine["doc"]) == tomlx.flatten(ref), src


def test_fixture_parity_vs_tomllib():
    for r in fixtures.toml_file_rows():
        try:
            src = r["payload"].decode("utf-8")
        except UnicodeDecodeError:
            assert not tomlx.parse_toml(r["payload"])["ok"]
            continue
        _agree(src, allow_gap=True)
    # the gap is real: tomllib parses multiline.toml, we flag it
    ml = [r for r in fixtures.toml_file_rows()
          if r["url"].endswith("multiline.toml")][0]
    assert not tomlx.parse_toml(ml["payload"])["ok"]
    tomllib.loads(ml["payload"].decode())


def _gen_doc(rng: random.Random) -> str:
    """Random valid-subset TOML: the generated sweep that makes the
    tomllib pin strong (the idnx 3000-label pattern)."""
    def key():
        k = rng.choice(["a", "b_1", "x-y", "Z9", '"odd key"',
                        "'lit'"])
        return k

    def scalar():
        return rng.choice([
            '"s\\tval"', "'raw'", "42", "-7", "1_000", "0xFf",
            "0o17", "0b101", "3.5", "-2e3", "6.02e-2", "true",
            "false", "inf", "-inf", "2024-01-02T03:04:05Z",
            "1999-12-31", "23:59:58",
            '"caf\\u00e9"'])

    def value(depth=0):
        r = rng.random()
        if depth < 2 and r < 0.2:
            n = rng.randrange(0, 4)
            return "[" + ", ".join(value(depth + 1)
                                   for _ in range(n)) + "]"
        if depth < 2 and r < 0.3:
            n = rng.randrange(1, 3)
            seen = set()
            parts = []
            while len(parts) < n:
                k = key()
                if k in seen:
                    continue
                seen.add(k)
                parts.append(f"{k} = {value(depth + 1)}")
            return "{" + ", ".join(parts) + "}"
        return scalar()

    lines = []
    used: set[str] = set()
    for t in range(rng.randrange(0, 3)):
        tname = f"tbl{t}" + (f".sub{t}" if rng.random() < 0.5
                             else "")
        lines.append(f"[{tname}]")
        used = set()
        for _ in range(rng.randrange(0, 4)):
            k = key()
            if k in used:
                continue
            used.add(k)
            lines.append(f"{k} = {value()}")
    head = []
    used = set()
    for _ in range(rng.randrange(0, 4)):
        k = key()
        if k in used:
            continue
        used.add(k)
        head.append(f"{k} = {value()}")
    return "\n".join(head + lines) + "\n"


def test_generated_sweep_vs_tomllib():
    rng = random.Random(61)
    for _ in range(300):
        _agree(_gen_doc(rng))


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.toml_file_rows():
        d = tomlx.parse_toml(r["payload"])
        if not d["ok"]:
            out.append((r["url"], 0, False, None, None, None))
            continue
        for (pos, key_path, vtype, text) in tomlx.flatten(d["doc"]):
            out.append((r["url"], pos, True, key_path, vtype, text))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 49


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.toml_file_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_toml_records(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(62)
    chars = "abc[]{}=.,\"'#\\\n\t 0123456789-+_eExo"
    for _ in range(400):
        src = "".join(rng.choice(chars)
                      for _ in range(rng.randrange(0, 120)))
        d = tomlx.parse_toml(src)
        assert isinstance(d["ok"], bool)
    for _ in range(100):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 120)))
        assert isinstance(tomlx.parse_toml(blob)["ok"], bool)
