#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query result parquet in outDir, runs the matching oracle SQL from
outDir/oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet registered as
views by bare name) and compares: schema (column names), row count, and
values (columns sorted by name, rows sorted by all columns).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        ecols, gcols = sorted(exp.columns), sorted(got.columns)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={gcols}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows differ: oracle={len(exp)} spark={len(got)}")
            failures += 1
            continue
        e = exp[ecols].sort_values(by=ecols, ignore_index=True)
        g = got[gcols].sort_values(by=gcols, ignore_index=True)
        try:
            eq = e.equals(g)
            if not eq:
                # pinpoint first mismatching cell
                diff = None
                for c in ecols:
                    ne = (e[c] != g[c]) & ~(e[c].isna() & g[c].isna())
                    if ne.any():
                        i = int(ne.idxmax())
                        diff = (c, i, e[c][i], g[c][i])
                        break
                print(f"FAIL {name}: values differ at {diff}")
                failures += 1
            else:
                print(f"OK   {name} ({len(exp)} rows)")
        except Exception as ex:
            print(f"FAIL {name}: compare error: {ex}")
            failures += 1
    print(f"{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'} "
          f"({len(oracles)} oracle queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
