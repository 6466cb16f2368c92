"""Unified-diff source: extractor/diffx.py (golden-pinned) — grammar
vectors, header harvest, clamps, and fuzz."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import diffx

GOLDEN_DIFF = "fixtures/golden_diff_hunks_seed42_n40.parquet"
_FCOLS = ("file_idx", "old_path", "new_path", "kind", "is_binary",
          "similarity")
_HCOLS = ("hunk_idx", "old_start", "old_len", "new_start", "new_len",
          "section", "n_added", "n_removed")


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.diff_file_rows(n):
        for f in diffx.parse_unified_diff(r["payload"]):
            head = (r["url"],) + tuple(f[c] for c in _FCOLS)
            if not f["hunks"]:
                out.append(head + (None,) * len(_HCOLS))
            for h in f["hunks"]:
                out.append(head + tuple(h[c] for c in _HCOLS))
    return out


def test_diff_match_committed_golden():
    golden = [tuple(r[c] for c in ("url",) + _FCOLS + _HCOLS)
              for r in pq.read_table(GOLDEN_DIFF).to_pylist()]
    assert golden == _pure_rows(40)
    assert len(golden) == 89


def test_git_grammar_vectors():
    patch = (b"diff --git a/x.py b/x.py\n"
             b"index 1111111..2222222 100644\n"
             b"--- a/x.py\n+++ b/x.py\n"
             b"@@ -10,7 +10,8 @@ def main():\n"
             b" ctx\n-old\n+new\n+more\n ctx\n"
             b"@@ -40 +41,2 @@\n-x\n+y\n+z\n"
             b"diff --git a/m.txt b/r.txt\n"
             b"similarity index 250%\n"
             b"rename from m.txt\nrename to r.txt\n"
             b"diff --git a/i.png b/i.png\n"
             b"Binary files a/i.png and b/i.png differ\n")
    files = diffx.parse_unified_diff(patch)
    assert [(f["kind"], f["old_path"], f["new_path"],
             len(f["hunks"])) for f in files] == [
        ("modify", "x.py", "x.py", 2),
        ("rename", "m.txt", "r.txt", 0),
        ("modify", "i.png", "i.png", 0)]
    h0, h1 = files[0]["hunks"]
    assert (h0["old_len"], h0["new_len"], h0["section"],
            h0["n_added"], h0["n_removed"]) \
        == (7, 8, "def main():", 2, 1)
    assert (h1["old_start"], h1["old_len"], h1["new_len"]) \
        == (40, 1, 2)                 # omitted size defaults to 1
    assert files[1]["similarity"] == 100      # clamp
    assert files[2]["is_binary"] is True


def test_plain_unified_devnull_and_clamps():
    patch = (b"--- lib/a.c\t2024-01-01 00:00:00\n"
             b"+++ /dev/null\n"
             b"@@ -1,99999999999 +0,0 @@\n-gone\n"
             b"--- /dev/null\n+++ b/new.c\n"
             b"@@ -0,0 +1,2 @@\n+a\n+b\n"
             b"\\ No newline at end of file\n")
    files = diffx.parse_unified_diff(patch)
    assert [(f["kind"], f["old_path"], f["new_path"])
            for f in files] == [("delete", "lib/a.c", None),
                                ("add", None, "new.c")]
    assert files[0]["hunks"][0]["old_len"] == (1 << 31) - 1
    assert files[1]["hunks"][0]["n_added"] == 2


def test_quoted_paths_and_fuzz():
    q = (b'diff --git "a/sp ace.txt" "b/t\\tab \\303\\251.txt"\n'
         b'--- "a/sp ace.txt"\n+++ "b/t\\tab \\303\\251.txt"\n'
         b"@@ -1 +1 @@\n-a\n+b\n")
    f = diffx.parse_unified_diff(q)[0]
    assert f["old_path"] == "sp ace.txt"
    assert f["new_path"] == "t\tab \xc3\xa9.txt"
    import random
    rng = random.Random("diffx-fuzz")
    for _ in range(200):
        payload = bytes(rng.randrange(256)
                        for _ in range(rng.randrange(500)))
        for g in diffx.parse_unified_diff(payload):
            assert g["old_path"] is not None \
                or g["new_path"] is not None
    for p in (b"", None, b"--- only\n", b"@@ -1 +1 @@\n+x\n"):
        assert diffx.parse_unified_diff(p) == []
