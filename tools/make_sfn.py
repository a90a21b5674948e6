#!/usr/bin/env python3
"""Parameterized deterministic FACTORx replication of /root/testdata/sf0.1 —
SCALING TRENDLINE ONLY; correctness always runs on driver-generated SFs.

Round-14 scheme: the whole TPC-H-ish star replicates COHERENTLY, the way a
real SF increase grows it — every replica k shifts each key family by
k * (its own table's max key + 1), applied consistently on both the
dimension and every fact column referencing it:

  lineitem  l_orderkey += k*M_O   l_partkey += k*M_P   l_suppkey += k*M_S
  orders    o_orderkey += k*M_O   o_custkey += k*M_C
  customer  c_custkey  += k*M_C
  supplier  s_suppkey  += k*M_S
  part      p_partkey  += k*M_P

so every replicated fact row still joins exactly one order/part/supplier/
customer and per-replica join cardinality matches the base — dimension
tables, join build sides, and matched outputs all grow with the factor
(TPC-H's own scaling behavior). Before round 14 only lineitem/documents
replicated and the dims were symlinks, so dim joins at sf1/sf5 measured
fact-scan growth against FIXED build sides (rq48-52 were probe floors,
not join evidence).

Deliberately NOT replicated (symlinked, documented):
  nation/region — fixed-size at every TPC-H SF by spec.
  events/embeddings — no linear-replication scheme that preserves their
    semantics (event streams and vector corpora don't key-shift
    meaningfully); any sfN row keyed on them measures the sf0.1 corpus
    and is labeled as such in BASELINE.md/SCALING.md.

documents keeps the round-7 scheme verbatim: id-shifted replicas with
per-replica marker tokens (~40% of shingles corpus-hot at sf5 — the
df-skew regime is by construction).

Usage: python3 tools/make_sfn.py <factor> <outdir>
  e.g. python3 tools/make_sfn.py 50 /root/repo/testdata_sf5
"""
import os, sys
import duckdb

factor = int(sys.argv[1])
out = sys.argv[2]
src = "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
con.execute("SET threads TO 16")

# key moduli from the PARENT tables (orders owns the orderkey domain:
# an order with no lineitems must not collide with replica 1's keys)
M_O = con.execute(f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
M_P = con.execute(f"SELECT max(p_partkey) + 1 FROM '{src}/part.parquet'").fetchone()[0]
M_S = con.execute(f"SELECT max(s_suppkey) + 1 FROM '{src}/supplier.parquet'").fetchone()[0]
M_C = con.execute(f"SELECT max(c_custkey) + 1 FROM '{src}/customer.parquet'").fetchone()[0]
print(f"moduli: orders={M_O} part={M_P} supplier={M_S} customer={M_C}")

REP = f"(SELECT unnest(range({factor})) AS k) k"

con.execute(f"""
COPY (
  SELECT base.* REPLACE (l_orderkey + k.k * {M_O} AS l_orderkey,
                         l_partkey  + k.k * {M_P} AS l_partkey,
                         l_suppkey  + k.k * {M_S} AS l_suppkey)
  FROM '{src}/lineitem.parquet' base, {REP}
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT base.* REPLACE (o_orderkey + k.k * {M_O} AS o_orderkey,
                         o_custkey  + k.k * {M_C} AS o_custkey)
  FROM '{src}/orders.parquet' base, {REP}
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT base.* REPLACE (c_custkey + k.k * {M_C} AS c_custkey)
  FROM '{src}/customer.parquet' base, {REP}
) TO '{out}/customer.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT base.* REPLACE (s_suppkey + k.k * {M_S} AS s_suppkey)
  FROM '{src}/supplier.parquet' base, {REP}
) TO '{out}/supplier.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT base.* REPLACE (p_partkey + k.k * {M_P} AS p_partkey)
  FROM '{src}/part.parquet' base, {REP}
) TO '{out}/part.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM '{src}/documents.parquet'),
       mx AS (SELECT max(doc_id) + 1 AS m FROM base),
       rep AS (
         SELECT base.*, k.k, mx.m FROM base, mx, (SELECT unnest(range({factor})) AS k) k)
  SELECT doc_id + k * m AS doc_id,
         CASE WHEN k = 0 THEN text ELSE
           array_to_string(
             flatten(list_transform(
               list_zip(string_split(text, ' '),
                        range(1, len(string_split(text, ' ')) + 1)),
               p -> CASE WHEN p[2] % 4 = 0
                         THEN [p[1], 'z' || CAST(k AS VARCHAR) || 'p'
                               || CAST(p[2] // 4 AS VARCHAR) || 'q']
                         ELSE [p[1]] END)), ' ')
         END AS text,
         lang, source, n_chars
  FROM rep
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

for t in ["region", "nation", "events", "embeddings"]:
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)

for t in ["lineitem", "orders", "customer", "supplier", "part", "documents"]:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("done:", out)
