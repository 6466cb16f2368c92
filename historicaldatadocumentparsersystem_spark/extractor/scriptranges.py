"""Unicode major-script block table (public Unicode block data) —
Spark-free so extractor-side oracles (idnx) can use it. The regex
pattern strings BOTH engines compile are GENERATED from this table
(operators/textstats.script_class_pattern) — never retyped."""
from __future__ import annotations

# Major-script BMP ranges (codepoint intervals).
SCRIPT_RANGES: tuple[tuple[str, tuple[tuple[int, int], ...]], ...] = (
    ("latin", ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F))),
    ("cyrillic", ((0x400, 0x4FF), (0x500, 0x52F))),
    ("greek", ((0x370, 0x3FF),)),
    ("arabic", ((0x600, 0x6FF), (0x750, 0x77F))),
    ("hebrew", ((0x590, 0x5FF),)),
    ("devanagari", ((0x900, 0x97F),)),
    ("han", ((0x3400, 0x4DBF), (0x4E00, 0x9FFF))),
    ("kana", ((0x3040, 0x309F), (0x30A0, 0x30FF))),
    ("hangul", ((0x1100, 0x11FF), (0xAC00, 0xD7AF))),
)
