#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify.scala output
(parquet per query + oracle_sql.json), run each oracle in DuckDB over the
same testdata parquet, and compare schema/rows/hash. Dev tool only."""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None  # optional qNN filter
skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()  # optional qNN skip list

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def _dtype_compatible(spark_t, duck_t):
    """Type pairs the driver's hash empirically tolerates (both sides encode
    to the same hashed value). Anything outside this set is drift."""
    if spark_t == duck_t:
        return True
    pair = (spark_t, duck_t)
    # integer-width pairs: pandas materializes both as int64, and the 215
    # green r06 rows include INTEGER/BIGINT mixes — values identical.
    ints = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
    if spark_t in ints and duck_t in ints:
        return True
    # float width: Spark writes DOUBLE; DuckDB FLOAT only via explicit cast.
    if pair == ("DOUBLE", "FLOAT") or pair == ("FLOAT", "DOUBLE"):
        return True
    # timestamp flavors carry the same micros value.
    ts = {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS"}
    if spark_t in ts and duck_t in ts:
        return True
    return False

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
def emit(name):
    v = results[name]
    print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + v), flush=True)

for name in sorted(oracle):
    if only and not any(name.startswith(o) for o in only):
        continue
    if any(name.startswith(o) for o in skip):
        print(f"SKIP {name}", flush=True)
        continue
    print(f"[checking] {name}", file=sys.stderr, flush=True)
    sql = oracle[name]
    pq = f"{out_dir}/{name}"
    try:
        spark_df = con.execute(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        results[name] = f"NO-SPARK-OUTPUT {e}"
        emit(name); continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        results[name] = f"ORACLE-SQL-ERROR {e}"
        emit(name); continue
    # column-name-sorted compare (mirrors driver: sorts columns by name)
    sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
    if sc != dc:
        results[name] = f"SCHEMA-MISMATCH spark={sc} duck={dc}"
        emit(name); continue
    # dtype-strict gate: the driver's value hash is dtype-sensitive (DuckDB
    # promoting SUM(BIGINT) to HUGEINT broke q139/q143 in r06 while this
    # replica's check_dtype=False stayed green). Compare the DuckDB-native
    # logical types of both sides and hard-fail on any unexplained drift;
    # HUGEINT anywhere in an oracle result is an automatic fail.
    try:
        stypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{pq}/*.parquet'").fetchall()}
        dtypes_ = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        bad_types = []
        for c in sc:
            st, dt = stypes.get(c), dtypes_.get(c)
            if dt in ("HUGEINT", "UHUGEINT"):
                bad_types.append(f"{c}: oracle={dt} (INT128 never matches a Spark type)")
            elif st != dt and not _dtype_compatible(st, dt):
                bad_types.append(f"{c}: spark={st} oracle={dt}")
        if bad_types:
            results[name] = "DTYPE-MISMATCH " + "; ".join(bad_types)
            emit(name); continue
    except Exception as e:
        results[name] = f"DTYPE-CHECK-ERROR {e}"
        emit(name); continue
    a = spark_df[sc]; b = duck_df[sc]
    if len(a) != len(b):
        results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
        emit(name); continue
    # row-order-insensitive value compare
    a2 = a.sort_values(by=sc, na_position="first").reset_index(drop=True)
    b2 = b.sort_values(by=sc, na_position="first").reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(a2, b2, check_dtype=False, check_exact=True)
        results[name] = "OK"
        emit(name)
    except AssertionError as e:
        results[name] = "VALUE-MISMATCH " + str(e).split("\n")[0]
        # show a small diff sample
        try:
            neq = (a2 != b2) & ~(a2.isna() & b2.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                results[name] += f" | first bad row {i}: spark={a2.loc[i].tolist()} duck={b2.loc[i].tolist()}"
        except Exception:
            pass
        emit(name)

ok = sum(1 for v in results.values() if v == "OK")
print(f"\n{ok}/{len(results)} oracle-checked queries pass")
# rows-only queries (parquet outputs without oracle entries)
for pq in sorted(glob.glob(f"{out_dir}/*/")):
    name = pq.rstrip("/").split("/")[-1]
    if name not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows" + ("  (EMPTY!)" if n == 0 else ""))
        except Exception as e:
            print(f"ROWS-ONLY {name}: ERROR {e}")
