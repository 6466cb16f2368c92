"""freedesktop .desktop family: spec quirks (locale keys, escapes,
first-wins dups, list escapes), Spark parity, fuzz."""

import random

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import (
    desktopx)


def test_entry_semantics():
    by = {r["url"].rsplit("/", 1)[1]: r["payload"]
          for r in fixtures.desktop_file_rows()}
    rows = desktopx.parse_desktop(by["crawlview.desktop"])
    vals = {(g, k, loc): v for (_p, g, k, loc, v) in rows}
    assert vals[("Desktop Entry", "Name", None)] == "Crawl Viewer"
    assert vals[("Desktop Entry", "Name", "fr")] == \
        "Visionneuse de crawl"
    # \n escape applied to string values
    assert vals[("Desktop Entry", "Comment", None)] == \
        "Line one\nline two"
    # action group rows keep their own group name
    assert vals[("Desktop Action Refresh", "Exec", None)] == \
        "crawlview --refresh"
    # list escape survives for split_list to honor
    cats = desktopx.split_list(
        vals[("Desktop Entry", "Categories", None)])
    assert cats == ["Network", "Web;Tools", "Utility"]
    # duplicate (group, key, locale): FIRST wins
    dup = desktopx.parse_desktop(by["dup.desktop"])
    names = [(loc, v) for (_p, _g, k, loc, v) in dup
             if k == "Name"]
    assert names == [(None, "First"), ("fr", "Premier")]
    # entries before any group header reject the file
    assert desktopx.parse_desktop(by["pre.desktop"]) == []
    assert desktopx.parse_desktop(by["junk.desktop"]) == []
    assert desktopx.parse_desktop(None) == []


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    pure = []
    for r in fixtures.desktop_file_rows():
        for row in desktopx.parse_desktop(r["payload"]):
            pure.append((r["url"],) + row)
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.desktop_file_rows()],
        "url string, payload binary").repartition(2)
    got = sorted((tuple(r) for r in
                  sources.read_desktop_entries(df).collect()),
                 key=str)
    assert got == sorted(pure, key=str)


def test_fuzz_never_raises():
    rng = random.Random(73)
    for _ in range(200):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        assert isinstance(desktopx.parse_desktop(blob), list)
