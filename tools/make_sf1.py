#!/usr/bin/env python3
"""Synthesize an sf1-scale bench directory by deterministic 10x replication
of /root/testdata/sf0.1 — SCALING TRENDLINE ONLY (BASELINE.md ratio-vs-SF
table); correctness always runs on the driver-generated SFs.

Replication schemes (designed so the 7 trendline queries scale linearly,
not quadratically):
- lineitem: replica k shifts l_orderkey by k*(max+1) — per-order group
  sizes and self-join pair counts stay constant per key, so rq02/rq18/rq26
  see 10x rows with the same per-group shape.
- documents: replica k>0 gets doc_id shifted by k*(max+1) AND a
  replica-specific marker token inserted after every 4th token: shingle
  sets of different replicas are mostly disjoint (no artificial cross-
  replica near-dup explosion in xq26/xq31), while WITHIN a replica the
  original near-dup structure is preserved (markers sit at the same
  positions in near-dup twins).

Other tables are symlinked from sf0.1 (the 7 queries never read them at
measure time; DuckDB's view setup needs the files to exist).

Usage: python3 tools/make_sf1.py [outdir]   (default /root/repo/testdata_sf1)
"""
import os, sys
import duckdb

src = "/root/testdata/sf0.1"
out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
con.execute("SET threads TO 16")

# lineitem: key-shifted replicas
con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM '{src}/lineitem.parquet'),
       mx AS (SELECT max(l_orderkey) + 1 AS m FROM base)
  SELECT base.* REPLACE (l_orderkey + k.k * mx.m AS l_orderkey)
  FROM base, mx, (SELECT unnest(range(10)) AS k) k
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")

# documents: id-shifted replicas with per-replica marker tokens every 4th
# position (k=0 is the original corpus verbatim)
con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM '{src}/documents.parquet'),
       mx AS (SELECT max(doc_id) + 1 AS m FROM base),
       rep AS (
         SELECT base.*, k.k, mx.m FROM base, mx, (SELECT unnest(range(10)) AS k) k)
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
