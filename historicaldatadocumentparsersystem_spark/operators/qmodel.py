"""Committed hashed-linear quality-classifier weights (fastText/DCLM-
style document-quality filter, integer micro-units).

Generated deterministically by ``tools/train_quality_weights.py``
(seeded logistic regression over 600 clean / 600 garbage synthetic
docs; train accuracy printed by the script). Regenerate by re-running
the script and committing the diff consciously — same contract as the
golden extraction parquet.

Score of a document with tokens t_1..t_n:
    sum_micro  = sum_i W_MICRO[md5_bucket(lower(t_i))]
    keep      <=> sum_micro > -BIAS_MICRO * n          (pure int64)
i.e. the usual length-normalized logit  b + (1/n)*sum w  > 0, cross-
multiplied by n so neither engine ever divides.
"""
from __future__ import annotations

N_BUCKETS = 128
SCALE = 1_000_000

BIAS_MICRO = -395846
W_MICRO = [
    1889848, 815488, 704348, 110394, -134853, -253309, -36950, -84264,
    -1575798, -500386, 2650140, -161379, -1224234, -444284, -71618, 846428,
    144240, -342983, -1148820, 67398, 1563133, 204361, -1097827, -1238206,
    -1053459, -1312488, -275907, -200367, -101122, -387916, -1252721, 812926,
    -1191120, -21269, -1227772, -1282846, -1198937, -275497, 1535473, -187188,
    -612060, 2241773, 862032, 937381, -174079, 747816, 791760, 829536,
    1714206, -409813, -1190757, -43637, -1007403, -1099536, -105209, 1787595,
    1299639, 2319430, -1070229, -984821, -1380631, -134745, -540769, -157353,
    2875505, -236143, -354082, -417943, -1195817, -355947, 705370, -607262,
    -1058519, -1143439, 314678, 749612, 978788, 2081949, 1561061, -298670,
    607655, -1079663, -522843, 641329, -84520, -375392, 495835, -101681,
    -418374, -378078, -102414, -280609, -940208, 1678582, -214206, 1611939,
    -1212933, -267523, -1316530, 2091034, -465302, -1299978, 2585661, 543049,
    810730, 1841763, 795777, -1178391, 1697708, 842413, -1297007, -710812,
    -195514, -1373844, 341511, 10833, -60486, -1164234, 917962, 292287,
    -149391, -177805, 979618, -1177264, -805714, -1099446, -1149565, -469340,
]
