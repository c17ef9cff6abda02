#!/usr/bin/env python3
"""Derive a larger scale-factor dataset from an existing one, for
PERFORMANCE measurement only (correctness stays gated on the driver's
sf0.01 data). Replicates each table k times with key offsets so join
fan-outs match a genuinely larger SF:

  - region/nation: constant at every SF (copied as-is)
  - customer/supplier/part: primary keys offset per copy
  - orders: o_orderkey + o_custkey offset  (joins keep TPC-H shape)
  - lineitem: l_orderkey/l_partkey/l_suppkey offset
  - events: event_id + user_id offset (user base scales with SF)
  - documents: doc_id offset, text passed through a per-copy character
    translation (rotating consonant map) so every token — and therefore
    every shingle — differs between copies: copies are NOT near-duplicates
    (a prefix tag is not enough: it shifts only the first two 3-gram
    shingles and leaves J ≈ 0.94 between copies, which makes the derived
    corpus 90% near-dups and the dedup pair set quadratic in k)
  - embeddings: vec_id offset (vectors repeat; bucket sizes scale like a
    corpus k times larger, which is the property the ANN bench needs)

Usage: make_sf.py <src_dir> <dst_dir> <k>
"""
import sys, duckdb, os

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def mx(table, col):
    return con.sql(f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

def copy(table, sql):
    con.sql(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

def rep(table, replaces):
    """k shifted copies via SELECT * REPLACE (schema-proof)."""
    parts = []
    for i in range(k):
        r = ", ".join(t.format(i=i) for t in replaces)
        parts.append(f"SELECT * REPLACE ({r}) FROM '{src}/{table}.parquet'")
    return " UNION ALL ".join(parts)

for t in ("region", "nation"):
    copy(t, f"SELECT * FROM '{src}/{t}.parquet'")

custk, suppk, partk = mx("customer", "c_custkey"), mx("supplier", "s_suppkey"), mx("part", "p_partkey")
ordk = mx("orders", "o_orderkey")
evk, usrk = mx("events", "event_id"), mx("events", "user_id")
dock, veck = mx("documents", "doc_id"), mx("embeddings", "vec_id")

copy("customer", rep("customer", [f"c_custkey + {{i}} * {custk} AS c_custkey"]))
copy("supplier", rep("supplier", [f"s_suppkey + {{i}} * {suppk} AS s_suppkey"]))
copy("part", rep("part", [f"p_partkey + {{i}} * {partk} AS p_partkey"]))
copy("orders", rep("orders", [f"o_orderkey + {{i}} * {ordk} AS o_orderkey",
                              f"o_custkey + {{i}} * {custk} AS o_custkey"]))
copy("lineitem", rep("lineitem", [f"l_orderkey + {{i}} * {ordk} AS l_orderkey",
                                  f"l_partkey + {{i}} * {partk} AS l_partkey",
                                  f"l_suppkey + {{i}} * {suppk} AS l_suppkey"]))
copy("events", rep("events", [f"event_id + {{i}} * {evk} AS event_id",
                              f"user_id + {{i}} * {usrk} AS user_id"]))
# Per-copy SEEDED PERMUTATION of the consonant map, not a rotation:
# rotations form a closed group of order 10, so two-stage derivation
# (sf0.1 -> sf1 -> sf10) composes them back onto each other and copy
# (i, j) collides with copy (i', j') whenever i+j = i'+j' (mod 10) —
# at k=100 that made every text appear ~10x verbatim and blew the dedup
# pair set up quadratically. Random permutations seeded per copy keep
# compositions distinct (10! images; verified below, loud failure).
import random
src_map = "bcdfghjklm"
# Salt the seed per DERIVATION STAGE (the source's distinct-text count
# differs every stage): with one shared family, stage-1 copy i composed
# with stage-2's identity equals stage-1's identity composed with
# stage-2 copy i — 10% of a two-stage corpus collided exactly that way.
perm_salt = con.sql(
    f"SELECT count(DISTINCT md5(text)) FROM '{src}/documents.parquet'").fetchone()[0]
def perm_for(i):
    chars = list(src_map)
    random.Random(9176 + 7919 * perm_salt + i).shuffle(chars)
    return "".join(chars)
doc_replaces = []
for i in range(k):
    if i == 0:
        doc_replaces.append([f"doc_id + 0 * {dock} AS doc_id"])
    else:
        doc_replaces.append([f"doc_id + {i} * {dock} AS doc_id",
                             f"translate(text, '{src_map}', '{perm_for(i)}') AS text"])
parts = []
for i in range(k):
    r = ", ".join(doc_replaces[i])
    parts.append(f"SELECT * REPLACE ({r}) FROM '{src}/documents.parquet'")
copy("documents", " UNION ALL ".join(parts))
n_src = con.sql(f"SELECT count(DISTINCT md5(text)) FROM '{src}/documents.parquet'").fetchone()[0]
n_dst = con.sql(f"SELECT count(DISTINCT md5(text)) FROM '{dst}/documents.parquet'").fetchone()[0]
# A handful of short texts may contain too few mapped consonants to
# distinguish two permutations — tolerate <0.1% residual collisions, but
# fail LOUDLY on structural collisions (the rotation-group bug was ~10%).
assert n_dst >= 0.999 * k * n_src, (
    f"copy translations collided: {n_dst} distinct texts, expected ~{k * n_src} "
    f"({k} copies x {n_src}) — the derived corpus would be cross-copy duplicated")
print(f"documents distinct texts: {n_dst} / {k * n_src} expected")
copy("embeddings", rep("embeddings", [f"vec_id + {{i}} * {veck} AS vec_id"]))
print("done:", dst)
