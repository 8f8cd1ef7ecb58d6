#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify output
against the DuckDB oracle SQL and diff. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # bound the oracle's resources: an output-superlinear oracle at a
    # large SF (the pairwise dedup verifiers) can otherwise spill cwd
    # temp files until the DISK fills (observed: 78 GB at sf1).
    # DUCKDB_MEM caps RAM (spill beyond it), DUCKDB_TMP moves the
    # spill off the repo volume; both overridable per run.
    mem = os.environ.get("DUCKDB_MEM", "24GB")
    con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("DUCKDB_TMP", "/tmp/duckdb_spill")
    Path(tmp).mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    # spill cap scales with the memory cap (max(40, 4*mem) GB): legit
    # large-SF oracles spill several times their RAM budget (observed
    # 78 GB at sf1 under the 24 GB default), so a fixed cap would make
    # a raised DUCKDB_MEM run abort on temp space the box can afford.
    # DUCKDB_TMP_MAX still overrides outright.
    try:
        mem_gb = float("".join(c for c in mem if c.isdigit() or c == "."))
    except ValueError:
        mem_gb = 24.0
    tmp_max = os.environ.get(
        "DUCKDB_TMP_MAX", f"{max(40, int(4 * mem_gb))}GB")
    con.execute(f"SET max_temp_directory_size='{tmp_max}'")
    # DUCKDB_THREADS: DuckDB 1.0 on this box fails spuriously at 32
    # threads on some tiny-output/big-scan shapes ("Failed to allocate
    # block of 16384 bytes" with tens of GB genuinely free — a
    # per-thread buffer-reservation artifact, deterministic per thread
    # count: the same query passes at 8). Fewer threads also shrink
    # peak spill for the pairwise-dedup oracles.
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        # driver testdata tables are single files; harness-written ones
        # (e.g. WidenVecs output) are Spark directories of part files
        path = Path(sf_dir, f"{t}.parquet")
        pat = f"{path}/*.parquet" if path.is_dir() else str(path)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = Path(out_dir, name)
        if not pdir.exists():
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(pdir))
        except Exception as e:
            print(f"[ERR ] {name}: read spark output: {e}")
            n_bad += 1
            continue
        try:
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: oracle failed: {e}")
            n_bad += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"[COLS] {name}: spark={list(spark_df.columns)} "
                  f"duck={list(duck_df.columns)}")
            n_bad += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"[ROWS] {name}: spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1
            continue
        # value compare; treat NaN == NaN
        try:
            mismatch = ~((spark_df == duck_df) |
                         (spark_df.isna() & duck_df.isna()))
            bad_cells = int(mismatch.values.sum())
        except Exception as e:
            print(f"[CMP ] {name}: compare failed: {e}")
            n_bad += 1
            continue
        if bad_cells:
            print(f"[DIFF] {name}: {bad_cells} differing cells "
                  f"of {spark_df.size} (rows={len(spark_df)})")
            bad_rows = mismatch.any(axis=1)
            print("  spark:", spark_df[bad_rows].head(3).to_dict("records"))
            print("  duck :", duck_df[bad_rows].head(3).to_dict("records"))
            n_bad += 1
        else:
            print(f"[ OK ] {name}: rows={len(spark_df)}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
