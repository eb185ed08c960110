#!/usr/bin/env python3
"""Dev-only: synthesize a ~10x scale fixture (sf1) from sf0.1 for SCALING
benchmarks (no oracle run at sf1 — correctness is pinned at sf0.01/sf0.1).

Usage: python3 tools/make_sf1.py [replicas] [outdir]

Design notes (what makes the scaled data honest):
 - Keys are replica-shifted so referential integrity holds within each
   replica (orders<->lineitem<->customer, part/supplier).
 - documents.text is token-perturbed per replica (token || replica tag), so
   replicas are NOT cross-replica near-duplicates: a real 10x corpus has
   ~10x the dup families, not 10 copies of every document. Replica 0 is
   byte-identical to sf0.1.
 - embeddings are direction-perturbed per replica for the same reason.
 - Output parquet uses small row groups so Spark's maxPartitionBytes
   splitting yields real scan parallelism (the sf fixtures are single-row-
   group files; at sf1 that would serialize every scan).
"""
import sys, os
import duckdb

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
SRC = "/root/testdata/sf0.1"
OFF = 10_000_000  # key shift per replica, far above any sf0.1 key

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

def write(name, sql):
    con.execute(f"""COPY ({sql}) TO '{OUT}/{name}.parquet'
                    (FORMAT PARQUET, ROW_GROUP_SIZE 200000)""")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")

def replicated(body_sql):
    """UNION ALL of body_sql evaluated per replica k (k available as macro)."""
    return "\nUNION ALL\n".join(body_sql.format(k=k) for k in range(REPLICAS))

# dims shared across replicas (nation/region are genuinely global)
write("region", "SELECT * FROM region")
write("nation", "SELECT * FROM nation")

write("customer", replicated(
    "SELECT c_custkey + {k}*" + str(OFF) + " AS c_custkey, c_name, "
    "c_nationkey, c_acctbal, c_mktsegment FROM customer"))

write("supplier", replicated(
    "SELECT s_suppkey + {k}*" + str(OFF) + " AS s_suppkey, s_name, "
    "s_nationkey, s_acctbal FROM supplier"))

write("part", replicated(
    "SELECT p_partkey + {k}*" + str(OFF) + " AS p_partkey, p_name, "
    "p_brand, p_type, p_size, p_retailprice FROM part"))

write("orders", replicated(
    "SELECT o_orderkey + {k}*" + str(OFF) + " AS o_orderkey, "
    "o_custkey + {k}*" + str(OFF) + " AS o_custkey, o_orderstatus, o_totalprice, "
    "o_orderdate, o_orderpriority FROM orders"))

write("lineitem", replicated(
    "SELECT l_orderkey + {k}*" + str(OFF) + " AS l_orderkey, "
    "l_partkey + {k}*" + str(OFF) + " AS l_partkey, "
    "l_suppkey + {k}*" + str(OFF) + " AS l_suppkey, "
    "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate FROM lineitem"))

# events.ts is INT64 TIMESTAMP(NANOS), which Spark reads via nanosAsLong —
# DuckDB COPY would rewrite it as a us timestamp and break Sources.events;
# replicate through pyarrow so the physical type is preserved exactly
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
ev = pq.read_table(f"{SRC}/events.parquet")
parts = []
for k in range(REPLICAS):
    t2 = ev
    for c in ("event_id", "user_id"):
        i = t2.schema.get_field_index(c)
        t2 = t2.set_column(i, c, pc.add(t2.column(c), k * OFF))
    parts.append(t2)
pq.write_table(pa.concat_tables(parts), f"{OUT}/events.parquet",
               row_group_size=200_000)
print(f"events: {sum(p.num_rows for p in parts)} rows")

# replica 0 keeps the original text; k>0 gets a per-token tag so replicas are
# not near-duplicates of each other (shingle sets become disjoint).
# n_chars is recomputed from the PERTURBED text (the fixture invariant is
# n_chars == length(text); copying the original value would ship data that
# is internally inconsistent for any n_chars-keyed operator).
write("documents", replicated(
    "SELECT doc_id + {k}*" + str(OFF) + " AS doc_id, lang, source, text, "
    "CAST(length(text) AS BIGINT) AS n_chars FROM ("
    "SELECT doc_id, lang, source, "
    "CASE WHEN {k} = 0 THEN text ELSE "
    "array_to_string(list_transform(string_split(text, ' '), "
    "t -> t || 'z{k}'), ' ') END AS text FROM documents)"))

# direction-perturb per replica: mix each component with a deterministic
# pseudo-random direction at ~45% weight, so replicas are genuinely
# different vectors (10 near-parallel copies of every vector would make
# the sf1 ANN benchmarks pathologically collision-heavy — a real 10x
# corpus is spread out, not 10 copies of the same point cloud)
write("embeddings", replicated(
    "SELECT vec_id + {k}*" + str(OFF) + " AS vec_id, label, "
    "CASE WHEN {k} = 0 THEN embedding ELSE "
    "list_transform(list_zip(embedding, "
    "list_transform(generate_series(1, len(embedding)), "
    "i -> sin(vec_id * 7919 + i * 104729 + {k} * 15485863))), "
    "p -> CAST(0.75 * p[1] + 0.45 * p[2] AS FLOAT)) END AS embedding "
    "FROM embeddings"))

print("done ->", OUT)
