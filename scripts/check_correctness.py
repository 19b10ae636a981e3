#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables,
sorts columns by name, sorts rows, and compares values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if len(sys.argv) > 3:  # optional comma-separated name filter
        keep = set(sys.argv[3].split(","))
        oracles = {k: v for k, v in oracles.items()
                   if k in keep or k.removesuffix(".parquet") in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = (glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
                 or glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        # Dtype-strict modulo integer width: the driver hashes the
        # pandas materialization; pandas' hashing widens every integer
        # to u8 before hashing (int32 5 == int64 5) but hashes FLOAT
        # BIT PATTERNS (float64 5.0 != int64 5). Empirically confirmed
        # against the r8 driver artifact: int32-vs-int64 columns passed
        # its hash, HUGEINT->float64-vs-int64 columns failed it. So an
        # int-width mismatch is fine; any float-vs-int (or other kind)
        # mismatch must be a local FAIL.
        def dclass(dt):
            return "int" if dt.kind in "iu" else str(dt)
        bad_dt = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns
                  if dclass(got[c].dtype) != dclass(want[c].dtype)]
        if bad_dt:
            print(f"FAIL {name}: dtypes {bad_dt}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:4])}")
            n_fail += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
