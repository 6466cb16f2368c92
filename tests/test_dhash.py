"""Perceptual image dedup: imagex.grayscale/dhash64 (pure kernels),
the image_dhash operator, and the shared hamming_near_pairs pigeonhole
pair generator (also the engine behind simhash_near_pairs)."""

import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import imagex, jpegx
from historicaldatadocumentparsersystem_spark.operators import multimodal
from historicaldatadocumentparsersystem_spark.operators.dedup import (
    hamming_near_pairs)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _pure_hashes() -> dict[str, tuple]:
    out = {}
    for mid, payload in fixtures.dhash_media_rows():
        try:
            try:
                w, h, ch, px = imagex.decode_png(payload)
            except Exception:
                try:
                    w, h, ch, px = imagex.decode_gif(payload)
                except Exception:
                    w, h, ch, px = jpegx.decode_jpeg(payload)
            out[mid] = (w, h, imagex.dhash64(px, w, h, ch))
        except Exception:
            out[mid] = (None, None, None)
    return out


def test_dhash_kernel_vectors():
    # 9x8 input: resize is identity, so bits are readable by hand
    ramp = bytes(x * 28 for y in range(8) for x in range(9))
    assert imagex.dhash64(ramp, 9, 8, 1) == 0          # left never brighter
    rev = bytes(ramp[::-1])
    assert imagex.dhash64(rev, 9, 8, 1) == -1          # left always brighter
    # single bright column 0 on row 0 only -> exactly bit 63 (MSB)
    one = bytearray(9 * 8)
    one[0] = 255
    assert imagex.dhash64(bytes(one), 9, 8, 1) == -(1 << 63)
    # ties (flat image) are "not brighter" -> 0
    assert imagex.dhash64(bytes([7] * 72), 9, 8, 1) == 0


def test_grayscale_channel_rules():
    assert imagex.grayscale(b"\x10\x20", 1) == b"\x10\x20"
    assert imagex.grayscale(b"\x10\xff\x20\x00", 2) == b"\x10\x20"
    # ITU-R 601 integer luma, alpha ignored for ch=4
    px3 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    assert imagex.grayscale(px3, 3) == bytes([76, 150, 29])
    px4 = bytes([255, 0, 0, 9, 0, 255, 0, 200])
    assert imagex.grayscale(px4, 4) == bytes([76, 150])


def test_fixture_separation():
    """Planted near-twins sit within the default threshold; distinct
    patterns sit far outside it — the margin the banding query needs."""
    H = _pure_hashes()
    for k in range(6):
        assert _ham(H[f"img{k}a"][2], H[f"img{k}b"][2]) <= 7, k
    assert _ham(H["img2a"][2], H["gif2"][2]) <= 7       # cross-format
    assert _ham(H["img4a"][2], H["jpg4"][2]) <= 7
    for a in range(6):
        for b in range(a + 1, 6):
            assert _ham(H[f"img{a}a"][2], H[f"img{b}a"][2]) >= 16, (a, b)
    assert H["bad0"] == (None, None, None)


def test_operator_matches_pure(spark):
    got = {r["media_id"]: (r["width"], r["height"], r["dhash"])
           for r in multimodal.image_dhash(
               fixtures.dhash_media_df(spark)).collect()}
    assert got == _pure_hashes()

    rows = fixtures.dhash_media_rows()
    docs = spark.createDataFrame(rows, "media_id string, payload binary")
    plan = (multimodal.image_dhash(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan           # map-only, one payload pass


def test_near_pairs_complete_and_planned(spark):
    """Banding finds EXACTLY the brute-force pairs (pigeonhole is
    lossless within the threshold) and plans as a hash join."""
    hashes = multimodal.image_dhash(fixtures.dhash_media_df(spark))
    pairs = multimodal.dhash_near_pairs(hashes, max_hamming=7)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}

    H = {m: v[2] for m, v in _pure_hashes().items() if v[2] is not None}
    ids = sorted(H)
    want = {(a, b): _ham(H[a], H[b])
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if _ham(H[a], H[b]) <= 7}
    assert got == want and len(want) >= 8

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hamming_near_pairs_brute_equivalence(spark):
    """Generic banding == brute force on random 64-bit fingerprints,
    including negative values (sign-bit bands shift arithmetically on
    both sides of the join)."""
    import random
    rng = random.Random("hamming-pairs")
    base = [rng.getrandbits(64) for _ in range(40)]
    fps = []
    for i, b in enumerate(base):
        fps.append(b)
        if i % 3 == 0:      # plant neighbors at 1-7 flipped bits
            flip = b
            for _ in range(rng.randint(1, 7)):
                flip ^= 1 << rng.randrange(64)
            fps.append(flip)
    signed = [v - (1 << 64) if v >= (1 << 63) else v for v in fps]
    df = spark.createDataFrame(
        [(f"d{i}", v) for i, v in enumerate(signed)],
        "id string, fp long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in hamming_near_pairs(df, "fp", "id", 64, 7).collect()}
    want = {}
    for i in range(len(signed)):
        for j in range(i + 1, len(signed)):
            d = _ham(signed[i], signed[j])
            if d <= 7:
                a, b = sorted((f"d{i}", f"d{j}"))
                want[(a, b)] = d
    assert got == want and len(want) >= 10


def test_hamming_near_pairs_rejects_zero_width_bands():
    with pytest.raises(ValueError):
        hamming_near_pairs(None, "fp", bits=64, max_hamming=80)
