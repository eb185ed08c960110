#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle comparison.

Not part of the shipped library. Usage:
    python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB (tables
registered as bare names over <sfDir>/*.parquet), and diffs values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load(sf_dir, out_dir, names):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracle = json.load(fh)
    results = {}
    for name, sql in sorted(oracle.items()):
        if names and name not in names:
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            results[name] = "MISSING spark output"
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{spark_path}/*.parquet"))],
            ignore_index=True) if glob.glob(f"{spark_path}/*.parquet") else pd.DataFrame()
        results[name] = diff(spark_df, oracle_df)
    return results

def diff(s, o):
    sc, oc = sorted(s.columns), sorted(o.columns)
    if sc != oc:
        return f"SCHEMA MISMATCH spark={sc} oracle={oc}"
    if len(s) != len(o):
        return f"ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}"
    s, o = s[sc].reset_index(drop=True), o[sc].reset_index(drop=True)
    bad = []
    # Type gate (VERDICT r10 #2): the driver's hash canonicalization is
    # kind-sensitive — a DuckDB HUGEINT lands in pandas as float64 while
    # Spark's int64 stays integer, hashing `50.0` != `50` on bit-equal
    # values. Compare dtype KINDS so that class fails here, before the
    # driver. (OracleTypeSpec pins exact widths via DESCRIBE; this is the
    # value-path backstop.)
    for c in sc:
        ka, kb = s[c].dtype.kind, o[c].dtype.kind
        # object columns (strings, lists) and NaN-promoted floats aside,
        # int-vs-float kind skew is exactly the driver's failure mode
        if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
            bad.append(f"col {c}: TYPE KIND MISMATCH spark={s[c].dtype} oracle={o[c].dtype}")
    if bad:
        return " | ".join(bad)
    for c in sc:
        a, b = s[c], o[c]
        if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime") or a.dtype == object:
            eq = a.astype(str).eq(b.astype(str))
        else:
            an, bn = a.isna(), b.isna()
            eq = (an & bn) | (a == b)
        if not eq.all():
            i = int(eq.idxmin())
            bad.append(f"col {c}: {int((~eq).sum())} diffs, first row {i}: spark={a[i]!r} oracle={b[i]!r}")
    return "OK" if not bad else " | ".join(bad)

if __name__ == "__main__":
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = set(sys.argv[3:])
    res = load(sf_dir, out_dir, names)
    width = max(len(k) for k in res) if res else 0
    fails = 0
    for k, v in sorted(res.items()):
        print(f"{k:<{width}}  {v}")
        if v != "OK":
            fails += 1
    print(f"\n{len(res) - fails}/{len(res)} OK")
    sys.exit(1 if fails else 0)
