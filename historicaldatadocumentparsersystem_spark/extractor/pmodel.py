"""Committed picture-classifier weights (integer micro units).

Generated deterministically by ``tools/train_picture_weights.py``
(seeded synthetic pixel corpus, 300 images/class; train accuracy
float 0.999 / integer 1.000). Regenerate by re-running the
script and committing the diff consciously — the golden-parquet
contract. Feature order: (edge_pm, sat_pm, uniq_pm, extreme_pm);
class order matches ``picturex.CLASSES``.
"""
from __future__ import annotations

B_MICRO = [-2136, -102, -3981, 6220]
W_MICRO = [
    [2, 0, 26, -2],
    [-4, 20, -13, -2],
    [48, -4, -1, 5],
    [-47, -15, -12, -1],
]
