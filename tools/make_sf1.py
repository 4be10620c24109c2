#!/usr/bin/env python3
"""Generate sf1.0 testdata (10x sf0.1) for the SCALING-DECADE bench —
tool-side only (the graded gates still run on the driver's sf0.01 /
sf0.1). Never touches /root/testdata; writes to tmp/sf1.0/.

Construction: bootstrap replication of sf0.1 with structure
preservation —
  * documents: replica 0 is sf0.1 verbatim; replicas 1..9 keep each
    doc's length, lang, source, and word multiset but SHUFFLE the
    word order with a per-(replica, doc) seeded RNG — so unigram
    stats, langid markers, and length distributions are exact while
    no replica is a byte-duplicate (the dedup family would otherwise
    see a degenerate 10-copy corpus and blow up quadratically inside
    every LSH bucket);
  * embeddings: fresh seeded unit-norm gaussian float32 vectors
    (matching the sf0.1 construction) — replicated vectors would
    make every ANN query degenerate on exact-duplicate neighbors;
  * events: replicas remap event_id and user_id (users scale with
    sf, the 30-day window stays — 10x traffic over the same span,
    like the generator would);
  * TPC-H tables: replicas remap the join keys consistently
    (orderkey/custkey/partkey/suppkey all offset per replica), so
    referential integrity and per-key fanouts are preserved;
    region/nation stay fixed (they are sf-independent).

Usage: python3 tools/make_sf1.py [outdir]   (default tmp/sf1.0)
"""
import os, random, sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1.0"
R = 10  # replicas (10x)
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def t(name):
    return f"read_parquet('{SRC}/{name}.parquet')"


def write(name, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")


# ── fixed dims ──
write("region", f"SELECT * FROM {t('region')}")
write("nation", f"SELECT * FROM {t('nation')}")

# ── key-remapped TPC-H replicas ──
reps = "(SELECT unnest(range(0, %d)) AS r)" % R
write("customer", f"""
  SELECT c_custkey + r * 15000 AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM {t('customer')}, {reps}""")
write("supplier", f"""
  SELECT s_suppkey + r * 1000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {t('supplier')}, {reps}""")
write("part", f"""
  SELECT p_partkey + r * 20000 AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM {t('part')}, {reps}""")
OK = con.execute(f"SELECT max(o_orderkey) + 1 FROM {t('orders')}").fetchone()[0]
write("orders", f"""
  SELECT o_orderkey + r * {OK} AS o_orderkey, o_custkey + r * 15000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {t('orders')}, {reps}""")
write("lineitem", f"""
  SELECT l_orderkey + r * {OK} AS l_orderkey, l_partkey + r * 20000 AS l_partkey,
         l_suppkey + r * 1000 AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {t('lineitem')}, {reps}""")

# ── events: id/user remap, same 30-day window ──
write("events", f"""
  SELECT event_id + r * 100000 AS event_id, ts, user_id + r * 1500 AS user_id,
         event_type, value, props
  FROM {t('events')}, {reps}""")

# ── documents: per-replica word shuffle ──
docs = con.execute(
    f"SELECT doc_id, text, lang, source, n_chars FROM {t('documents')} ORDER BY doc_id"
).fetchall()
ND = len(docs)
rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for r in range(R):
    for doc_id, text, lang, source, n_chars in docs:
        if r == 0:
            nt = text
        else:
            words = text.split(" ")
            random.Random(f"sf1:{r}:{doc_id}").shuffle(words)
            nt = " ".join(words)
        rows["doc_id"].append(doc_id + r * ND)
        rows["text"].append(nt)
        rows["lang"].append(lang)
        rows["source"].append(source)
        rows["n_chars"].append(len(nt))
pq.write_table(pa.table(rows, schema=pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())])), f"{OUT}/documents.parquet")
print(f"documents: {len(rows['doc_id'])} rows")

# ── embeddings: fresh seeded unit-norm gaussians ──
NE = con.execute(f"SELECT count(*) FROM {t('embeddings')}").fetchone()[0]
DIM = con.execute(f"SELECT len(embedding) FROM {t('embeddings')} LIMIT 1").fetchone()[0]
rng = np.random.default_rng(4242)
vecs = rng.standard_normal((NE * R, DIM)).astype(np.float32)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(NE * R, dtype=np.int64)),
    "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
    "label": pa.array((np.arange(NE * R) % 10).astype(np.int32)),
}), f"{OUT}/embeddings.parquet")
print(f"embeddings: {NE * R} rows")
print("done:", OUT)
