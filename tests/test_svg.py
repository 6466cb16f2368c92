"""SVG metadata/text: extractor/svgx.py (pure oracle, golden-pinned)
and the Spark operator."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import svgx

GOLDEN = "fixtures/golden_svg_seed42_n16.parquet"
_COLS = ("media_id", "width", "height", "view_box", "vb_width",
         "vb_height", "title", "desc", "text", "n_elements", "n_paths")


def _pure_rows() -> list[tuple]:
    out = []
    for r in fixtures.svg_media_rows(16):
        info = svgx.parse_svg(r["payload"])
        if info is None:
            continue
        out.append((r["media_id"], info.width, info.height,
                    info.view_box, info.vb_width, info.vb_height,
                    info.title, info.desc, info.text,
                    info.n_elements, info.n_paths))
    return out


def test_matches_committed_golden():
    golden = [tuple(r[k] for k in _COLS)
              for r in pq.read_table(GOLDEN).to_pylist()]
    assert golden == _pure_rows()
    assert len(golden) == 13


def test_dimension_and_text_semantics():
    p = svgx.make_svg(width="120.6", height="80px",
                      view_box="0, 0, 640.5, 480", title="T",
                      desc="D", texts=["a b", "c d"], n_paths=2)
    info = svgx.parse_svg(p)
    assert (info.width, info.height) == (121, 80)
    assert (info.vb_width, info.vb_height) == (640, 480)
    assert info.title == "T" and info.desc == "D"
    assert info.text == "a b\nc d"        # tspan text folds into <text>
    assert info.n_paths == 2
    # relative units are context-dependent -> None
    rel = svgx.parse_svg(svgx.make_svg(width="100%", height="4em"))
    assert (rel.width, rel.height) == (None, None)
    # un-namespaced roots still parse
    assert svgx.parse_svg(
        svgx.make_svg(width="10", namespaced=False)).width == 10


def test_junk_degrades():
    assert svgx.parse_svg(None) is None
    assert svgx.parse_svg(b"") is None
    assert svgx.parse_svg(b"<html><svg></svg></html>") is None  # non-svg root
    assert svgx.parse_svg(b"<svg unterminated") is None
    rng = random.Random("svgx-fuzz")
    for _ in range(200):
        blob = bytes(rng.randrange(32, 127)
                     for _ in range(rng.randrange(150)))
        svgx.parse_svg(b"<svg>" + blob)


def test_spark_operator_matches_golden(spark):
    from historicaldatadocumentparsersystem_spark.operators import (
        multimodal)
    files = fixtures.svg_media_rows(16)
    df = spark.createDataFrame(
        [(r["media_id"], r["payload"]) for r in files],
        "media_id string, payload binary").repartition(4)
    got = sorted(tuple(r)
                 for r in multimodal.svg_metadata(df).collect())
    assert got == sorted(_pure_rows())
