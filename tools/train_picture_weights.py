"""Train the committed picture-classifier weights (extractor/
pmodel.py) — the qmodel.py discipline applied to the F3 input gap.

Offline one-shot (stdlib + numpy, fully seeded): synthesizes a
labeled pixel corpus with four class generators —

- photo   : smoothed random field (neighbor-averaged noise, mild
            color tint) — dense gray histogram, mid gradients
- graphic : a few flat saturated rectangles — high channel spread,
            sparse histogram
- text    : near-white page with near-black strokes — extreme
            pixels + hard edges, zero saturation
- flat    : one solid color — everything quiet

— featurizes with ``extractor.picturex.picture_features`` (the
exact integer features the runtime uses), fits multinomial
logistic regression by full-batch gradient descent on
standardized features, folds the standardization into the weights,
and REGENERATES ``extractor/pmodel.py`` with integer micro-unit
constants. Commit the diff consciously (golden-parquet contract).

Run: python tools/train_picture_weights.py
"""
from __future__ import annotations

import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from historicaldatadocumentparsersystem_spark.extractor.picturex import (  # noqa: E402
    CLASSES, picture_features)

SCALE = 1_000  # micro-ish units per standardized-weight unit
N_PER_CLASS = 300
SEED = 42


def _photo(rng: random.Random, w: int, h: int) -> bytes:
    g = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    for _ in range(2):  # neighbor smoothing passes
        for y in range(h):
            for x in range(w):
                acc = g[y][x]
                cnt = 1
                if x: acc += g[y][x - 1]; cnt += 1
                if y: acc += g[y - 1][x]; cnt += 1
                g[y][x] = acc // cnt
    tr = rng.randrange(-40, 40)
    tb = rng.randrange(-40, 40)
    out = bytearray()
    for y in range(h):
        for x in range(w):
            v = g[y][x]
            out += bytes((max(0, min(255, v + tr)), v,
                          max(0, min(255, v + tb))))
    return bytes(out)


def _graphic(rng: random.Random, w: int, h: int) -> bytes:
    base = (rng.randrange(256), rng.randrange(256),
            rng.randrange(256))
    px = [list(base) for _ in range(w * h)]
    for _ in range(rng.randrange(2, 6)):
        x0, y0 = rng.randrange(w), rng.randrange(h)
        x1 = min(w, x0 + rng.randrange(4, w))
        y1 = min(h, y0 + rng.randrange(4, h))
        col = [0, 0, 0]
        col[rng.randrange(3)] = 255           # saturated primary
        col[rng.randrange(3)] = rng.randrange(128)
        for y in range(y0, y1):
            for x in range(x0, x1):
                px[y * w + x] = col
    return bytes(v for p in px for v in p)


def _text(rng: random.Random, w: int, h: int) -> bytes:
    bg = rng.randrange(250, 256)
    g = [[bg] * w for _ in range(h)]
    y = rng.randrange(0, 3)
    while y < h - 1:
        if rng.random() < 0.7:                # a text line
            for x in range(w):
                if rng.random() < 0.55:
                    ink = rng.randrange(0, 6)
                    g[y][x] = ink
                    if y + 1 < h and rng.random() < 0.5:
                        g[y + 1][x] = ink
        y += rng.randrange(2, 5)
    return bytes(v for row in g for v in row for _ in (0, 1, 2))


def _flat(rng: random.Random, w: int, h: int) -> bytes:
    v = rng.choice([0, 32, 128, 200, 255])
    c = (v, max(0, min(255, v + rng.randrange(-10, 10))), v)
    return bytes(x for _ in range(w * h) for x in c)


def main() -> None:
    rng = random.Random(SEED)
    gens = {"photo": _photo, "graphic": _graphic,
            "text": _text, "flat": _flat}
    X, y = [], []
    for ci, cname in enumerate(CLASSES):
        for _ in range(N_PER_CLASS):
            w = rng.randrange(16, 40)
            h = rng.randrange(16, 40)
            px = gens[cname](rng, w, h)
            X.append(picture_features(px, w, h, 3))
            y.append(ci)
    X = np.array(X, dtype=np.float64)
    y = np.array(y)
    mu, sigma = X.mean(0), X.std(0)
    sigma[sigma == 0] = 1.0
    Xs = (X - mu) / sigma
    k, f = len(CLASSES), X.shape[1]
    W = np.zeros((k, f))
    B = np.zeros(k)
    Y = np.eye(k)[y]
    lr = 0.5
    for _ in range(4000):
        Z = Xs @ W.T + B
        Z -= Z.max(1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(1, keepdims=True)
        G = P - Y
        W -= lr * (G.T @ Xs) / len(y)
        B -= lr * G.mean(0)
    acc = (np.argmax(Xs @ W.T + B, 1) == y).mean()
    # fold standardization: score = b' + w'.f  with w' = W/sigma,
    # b' = B - W.(mu/sigma)
    Wf = W / sigma
    Bf = B - (W * (mu / sigma)).sum(1)
    Wi = np.rint(Wf * SCALE).astype(np.int64)
    Bi = np.rint(Bf * SCALE).astype(np.int64)
    int_acc = (np.argmax(X @ Wi.T + Bi, 1) == y).mean()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "historicaldatadocumentparsersystem_spark", "extractor",
        "pmodel.py")
    with open(path, "w") as out:
        out.write(
            '"""Committed picture-classifier weights (integer '
            "micro units).\n\nGenerated deterministically by "
            "``tools/train_picture_weights.py``\n(seeded synthetic "
            f"pixel corpus, {N_PER_CLASS} images/class; train "
            f"accuracy\nfloat {acc:.3f} / integer {int_acc:.3f}). "
            "Regenerate by re-running the\nscript and committing "
            "the diff consciously — the golden-parquet\ncontract. "
            "Feature order: (edge_pm, sat_pm, uniq_pm, "
            'extreme_pm);\nclass order matches '
            "``picturex.CLASSES``.\n\"\"\"\n"
            "from __future__ import annotations\n\n")
        out.write(f"B_MICRO = {Bi.tolist()}\n")
        out.write("W_MICRO = [\n")
        for row in Wi.tolist():
            out.write(f"    {row},\n")
        out.write("]\n")
    print(f"wrote {path}: float acc {acc:.3f}, int acc {int_acc:.3f}")


if __name__ == "__main__":
    main()
