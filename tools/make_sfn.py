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

Round-15 closes the last replication gap: events replicate along the
USER axis (more users, same window — per-day cardinality scales, per-user
session/funnel/cohort structure preserved exactly) and embeddings via
per-replica deterministic SIGNED PERMUTATIONS of the dims (orthogonal:
intra-replica geometry bit-exact, cross-replica cosines ~N(0, 1/64)).
Rationale inline at each block.

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

def copy_table(table, sql):
    """Idempotent: skip tables already materialized (deterministic output),
    and UNLINK a pre-existing symlink first — COPY TO through a symlink
    would try to write the (read-only) base corpus it points at."""
    dst = f"{out}/{table}.parquet"
    if os.path.islink(dst):
        os.unlink(dst)
    elif os.path.exists(dst):
        print(f"skip {table} (exists)")
        return
    con.execute(sql)
    print(f"wrote {table}")



copy_table("lineitem", f"""
COPY (
  SELECT base.* REPLACE (l_orderkey + k.k * {M_O} AS l_orderkey,
                         l_partkey  + k.k * {M_P} AS l_partkey,
                         l_suppkey  + k.k * {M_S} AS l_suppkey)
  FROM '{src}/lineitem.parquet' base, {REP}
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")

copy_table("orders", f"""
COPY (
  SELECT base.* REPLACE (o_orderkey + k.k * {M_O} AS o_orderkey,
                         o_custkey  + k.k * {M_C} AS o_custkey)
  FROM '{src}/orders.parquet' base, {REP}
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")

copy_table("customer", f"""
COPY (
  SELECT base.* REPLACE (c_custkey + k.k * {M_C} AS c_custkey)
  FROM '{src}/customer.parquet' base, {REP}
) TO '{out}/customer.parquet' (FORMAT PARQUET)
""")

copy_table("supplier", f"""
COPY (
  SELECT base.* REPLACE (s_suppkey + k.k * {M_S} AS s_suppkey)
  FROM '{src}/supplier.parquet' base, {REP}
) TO '{out}/supplier.parquet' (FORMAT PARQUET)
""")

copy_table("part", f"""
COPY (
  SELECT base.* REPLACE (p_partkey + k.k * {M_P} AS p_partkey)
  FROM '{src}/part.parquet' base, {REP}
) TO '{out}/part.parquet' (FORMAT PARQUET)
""")

copy_table("documents", f"""
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

# events (round 15, shift fixed round 16): replicate along the USER axis —
# replica k shifts event_id by k*(max event_id+1) and user_id by the
# CUSTOMER modulus M_C (not max user_id+1), keeping timestamps verbatim.
# That models how an event stream actually grows 10x: more users in the
# same window, so per-day cardinality scales with the factor while
# per-user session/funnel/cohort structure is preserved exactly (each
# replica user behaves identically to its base user; a per-replica
# constant shift is structure-neutral for every per-user query).
# Why M_C: rq27_asof_join couples events to orders via user_id + 1 =
# o_custkey, and o_custkey shifts by k*M_C — shifting user_id by its own
# modulus broke the coupling at sfN (replica-k events pointed at
# pseudo-random other-replica customers; r15 ADVICE). M_C > max(user_id)
# (15000 vs 1499 at sf0.1), so replica user-id ranges stay disjoint and
# the +1 coupling is coherent within every replica. Day-shifting was
# rejected: it changes per-day counts by overlaying unrelated days and
# breaks every windowed oracle's group structure.
M_E = con.execute(f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
M_U_MAX = con.execute(f"SELECT max(user_id) FROM '{src}/events.parquet'").fetchone()[0]
assert M_U_MAX < M_C, (
    f"user_id range {M_U_MAX} >= customer modulus {M_C}: replicas would collide")
copy_table("events", f"""
COPY (
  SELECT base.* REPLACE (event_id + k.k * {M_E} AS event_id,
                         user_id  + k.k * {M_C} AS user_id)
  FROM '{src}/events.parquet' base, {REP}
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

# embeddings (round 15): replica k applies a deterministic SIGNED
# PERMUTATION of the 64 dims (seeded by k; k=0 is identity). A signed
# permutation is orthogonal, so every intra-replica inner product, norm,
# and cosine is preserved BIT-EXACTLY — near-dup pairs, cluster geometry,
# and ANN neighborhoods replicate per copy — while cross-replica cosines
# decorrelate to ~N(0, 1/64) (|cos| ~ 0.125 typical, far below any
# near-dup threshold), so replicas do not collapse into synthetic
# k-cliques. This is the faithful "10x more content with the same
# intrinsic structure" growth a vector corpus has; naive jitter cannot
# achieve both properties at once (small jitter makes every replica a
# near-dup of its base, large jitter destroys intra-replica pairs).
import random
M_V = con.execute(f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
dims = con.execute(f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]
branches = []
for k in range(factor):
    rng = random.Random(1000 + k)
    perm = list(range(1, dims + 1))
    signs = [1.0] * dims
    if k > 0:
        rng.shuffle(perm)
        signs = [rng.choice((-1.0, 1.0)) for _ in range(dims)]
    terms = ", ".join(
        f"CAST({s} * embedding[{p}] AS FLOAT)" for s, p in zip(signs, perm))
    branches.append(
        f"SELECT vec_id + {k} * {M_V} AS vec_id, [{terms}] AS embedding, "
        f"label FROM '{src}/embeddings.parquet'")
copy_table("embeddings", f"""
COPY ({' UNION ALL '.join(branches)})
TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

for t in ["region", "nation"]:
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)

for t in ["lineitem", "orders", "customer", "supplier", "part", "documents",
          "events", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("done:", out)
