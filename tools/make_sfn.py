#!/usr/bin/env python3
"""Parameterized variant of make_sf1.py: deterministic FACTORx replication
of /root/testdata/sf0.1 with the same linear-scaling schemes (key-shifted
lineitem replicas; id-shifted documents with per-replica marker tokens) —
SCALING TRENDLINE ONLY; correctness always runs on driver-generated SFs.

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

con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM '{src}/lineitem.parquet'),
       mx AS (SELECT max(l_orderkey) + 1 AS m FROM base)
  SELECT base.* REPLACE (l_orderkey + k.k * mx.m AS l_orderkey)
  FROM base, mx, (SELECT unnest(range({factor})) AS k) k
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
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

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "events", "embeddings"]:
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)

for t in ["lineitem", "documents"]:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("done:", out)
