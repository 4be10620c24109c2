#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: replay each
SparkEntry.oracleSql in DuckDB over the same tables and diff against
the parquet the Verify main dumped. Usage:
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import duckdb, glob, json, sys
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = sys.argv[3:] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            nfail += 1
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            nfail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            nfail += 1
            continue
        # dtype parity: the driver renders DuckDB HUGEINT differently
        # from Spark BIGINT even when values are equal (CORRECTNESS_r03
        # dedup_lines/txt_repetition/pipe_pack_sequences) — any dtype
        # drift between oracle and Spark output is a latent hash fail
        dtbad = [(c, str(exp[c].dtype), str(got[c].dtype))
                 for c in exp.columns if str(exp[c].dtype) != str(got[c].dtype)]
        if dtbad:
            c, de, dg = dtbad[0]
            print(f"FAIL {name}: dtype col={c} oracle={de} spark={dg} (CAST the oracle)")
            nfail += 1
            continue
        # compare as the driver would: exact values, row order as produced
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a != b and str(a) != str(b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main())
