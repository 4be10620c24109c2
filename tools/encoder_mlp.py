#!/usr/bin/env python3
"""A real NEURAL encoder speaking the graft ProcessTextEncoder line
protocol: hashed character-3-gram features -> a 2-layer MLP forward
pass (256 -> 128 tanh -> DIM) -> L2 normalization, all in numpy.

Unlike tools/encoder.py (the linear feature-hashing stand-in), this
runner does actual dense matrix math with a nonlinearity — the same
compute shape an ONNX / sentence-transformers runner has — so the
seam's batching, framing, and throughput are exercised by a real
model forward pass. Weights are generated once at startup from a
fixed PCG64 seed (bit-reproducible across runs and platforms), which
makes the encoder deterministic without shipping a weights file:
the gate spec pins determinism and unit-norm, not specific values
(cross-language float equality is a property of linear pipelines
like encoder.py, not of tanh networks — which is exactly why the
DuckDB-oracle path keeps the linear model while this one grades the
seam at library level).

Usage: encoder_mlp.py [DIM]      (default 64)
"""
import sys

import numpy as np

D_IN = 256
D_HID = 128


def unescape(s):
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "n":
                out.append("\n"); i += 2; continue
            if nxt == "r":
                out.append("\r"); i += 2; continue
            if nxt == "\\":
                out.append("\\"); i += 2; continue
        out.append(c)
        i += 1
    return "".join(out)


def features(text):
    """Signed hashed bag of char 3-grams, fixed 256 dims (the
    'tokenizer + embedding lookup' stage of the network)."""
    v = np.zeros(D_IN, dtype=np.float64)
    t = " " + text + " "
    for i in range(len(t) - 2):
        h = hash_3gram(t[i:i + 3])
        v[h % D_IN] += -1.0 if h < 0 else 1.0
    return v


def hash_3gram(g):
    import hashlib
    return int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8],
                          "big", signed=True)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(42)
    w1 = rng.standard_normal((D_IN, D_HID)) / np.sqrt(D_IN)
    b1 = rng.standard_normal(D_HID) * 0.01
    w2 = rng.standard_normal((D_HID, dim)) / np.sqrt(D_HID)
    for line in sys.stdin:
        text = unescape(line.rstrip("\n"))
        x = features(text)
        hdn = np.tanh(x @ w1 + b1)
        y = hdn @ w2
        nrm = float(np.linalg.norm(y))
        if nrm > 0.0:
            y = y / nrm
        sys.stdout.write(" ".join(repr(float(v)) for v in y))
        sys.stdout.write("\n")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
