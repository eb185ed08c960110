#!/usr/bin/env python3
"""Dev-only harness: DuckDB DESCRIBE for every oracle twin.

Not part of the shipped library. Usage:
    python3 tools/typegate.py <sfDir> <oracle_sql.json> [query ...]

Registers <sfDir>/*.parquet as bare-named views (same as the driver's
compare), runs `DESCRIBE <sql>` for each oracle entry, and prints one
TSV line per output column:

    <query>\t<column>\t<duckdb_type>

DESCRIBE plans the query without executing it, so this is cheap at any
SF. A query whose DESCRIBE fails prints `<query>\t!ERROR\t<message>`.
Consumed by OracleTypeSpec, which holds the DuckDB->Spark type contract
(VERDICT r10 #2: the HUGEINT disease class must fail locally).
"""
import json, sys, glob, os
import duckdb

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = set(sys.argv[3:])
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    with open(oracle_path) as fh:
        oracle = json.load(fh)
    for name, sql in sorted(oracle.items()):
        if names and name not in names:
            continue
        try:
            rows = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            msg = str(e).replace("\t", " ").replace("\n", " ")
            print(f"{name}\t!ERROR\t{msg}")
            continue
        for r in rows:
            print(f"{name}\t{r[0]}\t{r[1]}")

if __name__ == "__main__":
    main()
