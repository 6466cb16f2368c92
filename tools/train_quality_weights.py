"""Train the committed hashed-linear quality-classifier weights.

Offline one-shot (stdlib + numpy, fully seeded): generates a labeled
mini-corpus — "clean" documents assembled from an English wordlist vs
"garbage" documents (symbol soup, token repetition, base64-ish noise,
digit runs) — featurizes each as length-normalized counts over 128
md5-hash buckets, fits logistic regression by full-batch gradient
descent, and prints the integer-micro weight table to commit into
``historicaldatadocumentparsersystem_spark/operators/qmodel.py``.

Run: python tools/train_quality_weights.py  (regenerates qmodel.py
constants deterministically; commit the diff consciously, like the
golden parquet).

This mirrors the fastText/DCLM-style document-quality filter shape:
a linear model over hashed bag-of-words, cheap enough to run inline
at 10^12 documents. Weights are integers (micro-units) so the Spark
scorer and the DuckDB oracle do pure int64 math — no float parity
risk anywhere in the gate.
"""
from __future__ import annotations

import hashlib
import random

import numpy as np

N_BUCKETS = 128
SCALE = 1_000_000

COMMON = (
    "the be to of and a in that have i it for not on with he as you do "
    "at this but his by from they we say her she or an will my one all "
    "would there their what so up out if about who get which go me when "
    "make can like time no just him know take people into year your good "
    "some could them see other than then now look only come its over "
    "think also back after use two how our work first well way even new "
    "want because any these give day most us great little world own old "
    "right still such last long might never under while house part "
    "found between always those both city end large often together "
    "asked during history information example question service system "
    "public report research national market report street number"
).split()
TOPIC = (
    "data spark query engine table scan filter join merge sort window "
    "group batch stream page crawl corpus token text content extract "
    "layout span block score density link boiler plate article main "
    "history archive record document parse render fetch index shard"
).split()


def bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_BUCKETS


def clean_doc(rng: random.Random) -> str:
    words = []
    for _ in range(rng.randint(4, 10)):
        n = rng.randint(6, 14)
        words += [rng.choice(COMMON) if rng.random() < 0.7
                  else rng.choice(TOPIC) for _ in range(n)]
    return " ".join(words)


def garbage_doc(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:                               # symbol soup
        return " ".join("".join(rng.choice("#$%&*+=~^|<>{}[]()!?/\\")
                                for _ in range(rng.randint(3, 10)))
                        for _ in range(rng.randint(10, 60)))
    if kind == 1:                               # single-token repetition
        t = rng.choice(TOPIC + ["click", "here", "buy"])
        return " ".join([t] * rng.randint(15, 80))
    if kind == 2:                               # base64-ish gibberish
        alpha = "abcdefghijklmnopqrstuvwxyzABCDEF0123456789+/"
        return " ".join("".join(rng.choice(alpha)
                                for _ in range(rng.randint(8, 20)))
                        for _ in range(rng.randint(10, 50)))
    return " ".join(str(rng.randrange(10 ** 9))    # digit runs
                    for _ in range(rng.randint(10, 60)))


def featurize(doc: str) -> np.ndarray:
    x = np.zeros(N_BUCKETS)
    toks = doc.lower().split()
    for t in toks:
        x[bucket(t)] += 1.0
    return x / max(len(toks), 1)


def main() -> None:
    rng = random.Random(42)
    docs = [(clean_doc(rng), 1.0) for _ in range(600)] + \
           [(garbage_doc(rng), 0.0) for _ in range(600)]
    X = np.stack([featurize(d) for d, _ in docs])
    y = np.array([label for _, label in docs])

    w = np.zeros(N_BUCKETS)
    b = 0.0
    lr, l2 = 2.0, 1e-3
    for _ in range(3000):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(y) + l2 * w)
        b -= lr * g.mean()
    acc = ((X @ w + b > 0) == (y > 0.5)).mean()
    print(f"# train accuracy: {acc:.4f}  (600 clean / 600 garbage)")
    w_micro = [int(round(v * SCALE)) for v in w]
    print(f"BIAS_MICRO = {int(round(b * SCALE))}")
    print("W_MICRO = [")
    for i in range(0, N_BUCKETS, 8):
        print("    " + ", ".join(str(v) for v in w_micro[i:i + 8]) + ",")
    print("]")


if __name__ == "__main__":
    main()
