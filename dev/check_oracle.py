#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir> [query ...]
Compares each query's Spark parquet dump against its oracle SQL run in
DuckDB over the same parquet tables: row count, sorted-column schema, and
a hash of the value matrix (columns sorted by name, rows sorted).
"""
import sys, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    # Mirror the driver harness: its pandas-based compare cannot hash
    # list/map/struct cells (r10 q282: "unhashable type: numpy.ndarray").
    # str()-canonicalizing here would hide that class of failure, so
    # reject complex cells outright — queries must emit atomic columns.
    if isinstance(v, (list, tuple, dict, set)):
        raise TypeError(f"non-atomic cell (driver compare cannot hash it): {type(v).__name__}")
    return str(v)

def matrix_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
            orc = con.execute(sql)
            orc_rows, orc_cols = orc.fetchall(), [d[0] for d in orc.description]
            rows_ok = len(sp_rows) == len(orc_rows)
            schema_ok = sorted(sp_cols) == sorted(orc_cols)
            hash_ok = schema_ok and matrix_hash(sp_cols, sp_rows) == matrix_hash(orc_cols, orc_rows)
            flag = "OK " if (rows_ok and schema_ok and hash_ok) else "FAIL"
            print(f"{flag} {name}: rows {len(sp_rows)}/{len(orc_rows)} "
                  f"schema={schema_ok} hash={hash_ok}")
            if not schema_ok:
                print(f"     spark={sorted(sp_cols)} oracle={sorted(orc_cols)}")
        except Exception as e:
            print(f"ERR  {name}: {e}")

if __name__ == "__main__":
    main()
