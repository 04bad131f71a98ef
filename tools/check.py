#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables,
sorts columns by name + rows, and compares values cell-by-cell.
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [colnames[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_weak = 0
    for name in names:
        tbl = pq.read_table(os.path.join(out_dir, name))
        s_cols = tbl.column_names
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        if name not in oracles:
            status = "WEAK(rows=%d)" % len(s_rows)
            n_weak += 1
            print(f"{name:32s} {status}")
            continue
        try:
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"{name:32s} ORACLE-ERROR {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, orows = canon(o_rows, o_cols)
        if sc != oc:
            print(f"{name:32s} SCHEMA-MISMATCH spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orows:
            print(f"{name:32s} VALUE-MISMATCH rows spark={len(sr)} oracle={len(orows)}")
            for i, (a, b) in enumerate(zip(sr, orows)):
                if a != b:
                    print(f"   first diff row {i}:\n     spark : {a}\n     oracle: {b}")
                    break
            if len(sr) != len(orows):
                only_s = [r for r in sr[:5000] if r not in orows[:5000]][:2]
                print(f"   sample spark-only: {only_s}")
            n_fail += 1
        else:
            print(f"{name:32s} PASS rows={len(sr)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_weak} weak ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
