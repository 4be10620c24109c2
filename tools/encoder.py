#!/usr/bin/env python3
"""Feature-hashing text encoder speaking the graft ProcessTextEncoder
line protocol (one escaped text per request line; `dim`
space-separated floats per reply line, flushed per line).

The model is the signed hashing trick (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning") over character
3-grams, L2-normalized — a REAL cross-language embedding model, not
an echo: the Spark side cannot shortcut it, and a Scala mirror must
reproduce it bit-for-bit (ProcessEncoderGateSpec does). Swap the body
of `embed` for an ONNX / sentence-transformers call in production;
the wire contract and the Spark-side plumbing stay identical.

Usage: encoder.py [DIM]      (default 64)
"""
import sys
import hashlib


def unescape(s):
    # protocol escapes: \\ \n \r — scanned left-to-right (a chained
    # str.replace mis-decodes backslash runs)
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


def embed(text, dim):
    v = [0.0] * dim
    # character 3-grams over the space-padded text: word boundaries
    # contribute, and one- and two-char texts still hash
    t = " " + text + " "
    for i in range(len(t) - 2):
        g = t[i:i + 3]
        # first 8 md5 bytes as a SIGNED big-endian 64-bit int: the
        # same value a JVM ByteBuffer.getLong reads, so the Scala
        # mirror agrees exactly. Python % is floorMod, matching
        # java.lang.Math.floorMod on the signed value.
        h = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8],
                           "big", signed=True)
        v[h % dim] += -1.0 if h < 0 else 1.0
    nrm = sum(x * x for x in v) ** 0.5
    if nrm > 0.0:
        v = [x / nrm for x in v]
    return v


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    for line in sys.stdin:
        text = unescape(line.rstrip("\n"))
        vec = embed(text, dim)
        sys.stdout.write(" ".join(repr(x) for x in vec))
        sys.stdout.write("\n")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
