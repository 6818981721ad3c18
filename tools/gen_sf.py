#!/usr/bin/env python3
"""Scale a driver testdata dir up by an integer factor for LOCAL bench
smokes (e.g. the sf1 band in BASELINE.md). /root/testdata is read-only and
the driver only ships sf up to 0.1, so superlinear-scaling surprises the
small SFs can't expose are probed against a synthetic 10x replica set.

Replica construction keeps the per-replica statistics of the source so
costs scale LINEARLY in the factor (what a real 10x corpus does):
  - fact/dim keys shift by (max_key + 1) * replica, so uniqueness and
    intra-replica join relationships hold and replica 0 stays byte-level
    query-compatible (the ANN probes' fixed vec_ids, etc.);
  - document text gets a per-replica suffix on EVERY token: shingle sets
    of different replicas are disjoint, so near-dup candidate pairs grow
    ~10x, not ~100x (10 identical copies of each doc would quadratically
    explode every LSH bucket — not what a bigger corpus looks like);
  - embeddings get small deterministic per-replica Gaussian jitter
    (cosine-scale-invariance makes pure scaling a no-op, and identical
    copies would degenerate ANN cells).

Usage: python3 tools/gen_sf.py <srcDir> <dstDir> <factor>
"""
import sys, os, glob
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def shift(col, stride):
    return f"({col} + {stride} * r.i) AS {col}"

def replicate(table, exprs, order):
    p = f"{src}/{table}.parquet"
    sql = f"""
      COPY (SELECT {', '.join(exprs)}
            FROM '{p}' t CROSS JOIN (SELECT unnest(range({factor})) AS i) r
            ORDER BY {order})
      TO '{dst}/{table}.parquet' (FORMAT parquet)"""
    con.execute(sql)
    print(table, con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0])

def stride_of(table, key):
    return con.sql(f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

# fixed-size dimensions: straight copies
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT parquet)")
    print(t, "copied")

sc = stride_of("customer", "c_custkey")
ss = stride_of("supplier", "s_suppkey")
sp = stride_of("part", "p_partkey")
so = stride_of("orders", "o_orderkey")
se = stride_of("events", "event_id")
su = stride_of("events", "user_id")
sd = stride_of("documents", "doc_id")

replicate("customer",
          [shift("c_custkey", sc), "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
          "c_custkey")
replicate("supplier",
          [shift("s_suppkey", ss), "s_name", "s_nationkey", "s_acctbal"],
          "s_suppkey")
replicate("part",
          [shift("p_partkey", sp), "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
          "p_partkey")
replicate("orders",
          [shift("o_orderkey", so), shift("o_custkey", sc),
           "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
          "o_orderkey")
replicate("lineitem",
          [shift("l_orderkey", so), shift("l_partkey", sp), shift("l_suppkey", ss),
           "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
           "l_returnflag", "l_linestatus", "l_shipdate"],
          "l_orderkey, l_linenumber")
replicate("events",
          [shift("event_id", se), "ts", shift("user_id", su),
           "event_type", "value", "props"],
          "event_id")
# per-token replica suffix: disjoint shingle spaces between replicas
replicate("documents",
          [shift("doc_id", sd),
           r"""(CASE WHEN r.i = 0 THEN text
                ELSE regexp_replace(text, '(\S+)', '\1~r' || r.i, 'g') END) AS text""",
           "lang", "source",
           r"""length(CASE WHEN r.i = 0 THEN text
                ELSE regexp_replace(text, '(\S+)', '\1~r' || r.i, 'g') END) AS n_chars"""],
          "doc_id")

# embeddings: numpy jitter (seeded per replica), schema preserved
t = pq.read_table(f"{src}/embeddings.parquet")
vec_ids = t.column("vec_id").to_numpy()
labels = t.column("label").to_numpy()
emb = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
sv = int(vec_ids.max()) + 1
parts = []
for i in range(factor):
    e = emb.copy()
    if i > 0:
        e += np.random.default_rng(42 + i).normal(0, 0.05, e.shape).astype(np.float32)
    parts.append(pa.table({
        "vec_id": pa.array(vec_ids + sv * i, pa.int64()),
        "embedding": pa.array(list(e), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))
pq.write_table(pa.concat_tables(parts), f"{dst}/embeddings.parquet")
print("embeddings", factor * len(vec_ids))
