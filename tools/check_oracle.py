#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mimics the driver's correctness gate: run graft.Verify (Spark) to dump each
query's result parquet + oracle_sql.json, then run each oracle SQL in DuckDB
against the same testdata tables and compare (columns sorted by name, rows
sorted, values hashed). Usage:

    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [--budget-seconds N]

Each oracle's DuckDB wall time is printed on its line and the slowest five
are summarized at the end — the r6/r7 correctness-gate outage was caused by
oracle SQL silently creeping past the driver's budget (three ~190 s
recursive/exhaustive oracles), so budget creep must be visible locally.
With --budget-seconds N, any single oracle exceeding N seconds FAILS the
gate even if its values match.
"""
import sys, os, json, glob, hashlib, time
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(f"{c}:{df[c].dtype}" for c in df.columns)).encode())
    for _, row in df.iterrows():
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()[:16]

def main(sf_dir: str, out_dir: str, budget: float | None = None) -> int:
    con = duckdb.connect()
    timings: dict[str, float] = {}
    n_over = 0
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)
    n_pass = n_fail = n_noracle = 0
    results = sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    # a query that errored inside Verify dumps nothing — that's a failure,
    # not a skip (caught here so a missing dir can't slip through the gate)
    for name in sorted(set(oracles) - set(results)):
        n_fail += 1
        print(f"  [FAIL-MISSING] {name}: no Verify output (query errored?)")
    for name in results:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            if len(spark_df) == 0:
                print(f"    WARNING: zero rows")
            continue
        t0 = time.monotonic()
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-SQL ] {name}: oracle SQL error: {e}")
            continue
        dt = time.monotonic() - t0
        timings[name] = dt
        if budget is not None and dt > budget:
            n_over += 1
            n_fail += 1
            print(f"  [FAIL-BUDGET] {name}: oracle took {dt:.1f}s > budget {budget:.0f}s")
            continue
        a, b = canon(spark_df), canon(oracle_df)
        schema_ok = list(a.columns) == list(b.columns)
        if not schema_ok:
            n_fail += 1
            print(f"  [FAIL-SCHEMA] {name}: spark={list(a.columns)} oracle={list(b.columns)}")
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"  [FAIL-ROWS] {name}: spark={len(a)} oracle={len(b)}")
            continue
        ha, hb = table_hash(a), table_hash(b)
        if ha == hb:
            n_pass += 1
            print(f"  [pass] {name}: {len(a)} rows, hash={ha}, oracle {dt:.2f}s")
        else:
            n_fail += 1
            print(f"  [FAIL-HASH] {name}: {len(a)} rows")
            # show first diffs
            for c in a.columns:
                if not a[c].equals(b[c]):
                    diff = a[c] != b[c]
                    # NaN == NaN treated equal
                    if a[c].dtype.kind == 'f':
                        import numpy as np
                        diff = pd.Series(~(np.isclose(a[c], b[c], equal_nan=True)), index=a.index)
                    idx = diff[diff].index[:3]
                    for i in idx:
                        print(f"    col {c} row {i}: spark={a[c][i]!r} oracle={b[c][i]!r}")
    if timings:
        total = sum(timings.values())
        slow = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
        print(f"\noracle wall time: total {total:.1f}s; slowest: "
              + ", ".join(f"{n} {t:.1f}s" for n, t in slow))
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_noracle}"
          + (f" over_budget={n_over}" if budget is not None else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    budget = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--budget-seconds" and i + 1 < len(argv):
            budget = float(argv[i + 1])
            args.remove(argv[i + 1])
    sys.exit(main(args[0], args[1], budget))
