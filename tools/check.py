#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Spark result
parquet dumped by graft.Verify (columns sorted by name, values compared
row-by-row). Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

# Flake-evident gate (r17: CORRECTNESS json arrived as `{}` while the
# engine was green): a missing/empty verify dir or a verify run that never
# reached its end-of-run manifest is a LOUD nonzero failure with a named
# reason — never an empty result set.
def die(reason):
    print(f"CHECK_ABORT: {reason}", file=sys.stderr)
    sys.exit(2)

if not os.path.isdir(out_dir):
    die(f"verify output dir missing: {out_dir}")
_subdirs = [d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))]
if not _subdirs:
    die(f"verify output dir has no query outputs: {out_dir}")
if not os.path.exists(f"{out_dir}/oracle_sql.json"):
    die(f"oracle_sql.json missing from {out_dir} (verify run incomplete)")
if os.path.exists(f"{out_dir}/_manifest.json"):
    _mf = json.load(open(f"{out_dir}/_manifest.json"))
    _declared = {k for k in _mf if not k.startswith("_")}
    _errored = sorted(k for k in _declared
                      if str(_mf[k]).startswith("error"))
    if _errored:
        print(f"CHECK_WARN: verify recorded errors for {_errored}",
              file=sys.stderr)
    # an errored query legitimately has no output dir; anything else
    # declared-but-absent means the artifact was truncated after the run
    _missing = sorted(_declared - set(_subdirs) - set(_errored))
    if _missing:
        die(f"manifest declares {len(_declared)} queries but outputs are "
            f"missing for {_missing[:10]}")
else:
    print("CHECK_WARN: no _manifest.json — verify run may be from an "
          "older build or was interrupted", file=sys.stderr)

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = "NO_SPARK_OUTPUT"
        continue
    spark_df = con.sql(f"SELECT * FROM '{files[0]}'").df()
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(spark_df)}"
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        # transient-allocator hardening: duckdb occasionally fails a
        # tiny allocation on this host even with >100G free (observed
        # on q151's iterative-CTE oracle; the same SQL over the same
        # outputs verifies clean seconds later). Retry once on a FRESH
        # connection before recording an error, so only persistent
        # failures surface.
        try:
            con2 = duckdb.connect()
            con2.execute("SET TimeZone='UTC'")
            for t in ["region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents",
                      "embeddings"]:
                pth = f"{sf_dir}/{t}.parquet"
                if os.path.exists(pth):
                    con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pth}'")
            duck_df = con2.sql(oracle[name]).df()
        except Exception:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
    s = spark_df[sorted(spark_df.columns)]
    o = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(o.columns):
        results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(o.columns)}"
        continue
    if len(s) != len(o):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(o)}"
        continue
    # value compare, normalizing to strings (ints/floats/lists/timestamps)
    def norm(df):
        out = []
        for row in df.itertuples(index=False):
            vals = []
            for v in row:
                if v is None:
                    vals.append("NULL")
                elif isinstance(v, float):
                    vals.append("NULL" if v != v else f"{v:.6f}")
                elif hasattr(v, "tolist"):  # numpy arrays / lists
                    lv = v.tolist()
                    vals.append(str([f"{x:.6f}" if isinstance(x, float) else str(x) for x in lv]))
                else:
                    sv = str(v)
                    vals.append("NULL" if sv in ("nan", "NaT", "None") else sv)
            out.append("|".join(vals))
        return out
    sn, on_ = norm(s), norm(o)
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(sn, on_)) if a != b]
    if bad:
        i, a, b = bad[0]
        results[name] = f"VALUE_MISMATCH n={len(bad)} first@{i}: spark={a[:120]} duck={b[:120]}"
    else:
        results[name] = "PASS"

npass = sum(1 for v in results.values() if v == "PASS")
nrows = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
for k, v in sorted(results.items()):
    print(f"{k:32s} {v}")
print(f"\n{npass} PASS, {nrows} ROWS_ONLY, {len(results) - npass - nrows} FAIL of {len(results)}")
