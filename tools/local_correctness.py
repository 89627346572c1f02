#!/usr/bin/env python
"""Full-surface correctness artifact (VERDICT r3, next-round item #1).

The grading driver samples only the alphabetical first 50 of the
declared queries into CORRECTNESS_r{N}.json; this script runs the SAME
per-query check (row count + schema + order-insensitive value-hash vs
the DuckDB oracle at sf0.01) over ALL declared queries and writes
LOCAL_CORRECTNESS_r{N}.json in the driver's exact per-query schema, so
every query has a machine-readable correctness row every round.

Usage:
    python tools/local_correctness.py [round_number]

Env:
  SPARK_GRAFT_SF_DIR  fixture dir (default /root/testdata/sf0.01 — the
                      driver's correctness scale factor)

Run from anywhere; a FOREIGN SparkSession (no pre-set engine confs) is
used deliberately, mirroring the driver's environment.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "X"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    from oracle_utils import (
        driver_trap_errors,
        duck_connect,
        duck_pandas_kinds,
        normalize,
        run_duck,
        run_spark,
    )
    from sparkify_datalake_spark.registry import oracle_sql, queries

    spark = (
        SparkSession.builder.appName("local-correctness")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    qs, oracles = queries(), oracle_sql()
    con = duck_connect(sf_dir)

    out: dict[str, dict] = {}
    n_fail = 0
    t_start = time.perf_counter()
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                # single execution per engine (compare() re-run would
                # double the sweep cost): same checks as tests/test_oracle
                s_rows, s_cols, s_schema = run_spark(spark, qs[name], sf_dir)
                d_rows, d_cols = run_duck(con, oracles[name])
                errors = driver_trap_errors(
                    s_schema, s_rows, s_cols,
                    duck_pandas_kinds(con, oracles[name]),
                )
                schema_ok = sorted(s_cols) == sorted(d_cols)
                if not schema_ok:
                    errors.append(
                        f"columns differ: spark={sorted(s_cols)} "
                        f"duck={sorted(d_cols)}"
                    )
                rows_ok = len(s_rows) == len(d_rows)
                if not rows_ok:
                    errors.append(
                        f"row counts differ: spark={len(s_rows)} "
                        f"duck={len(d_rows)}"
                    )
                if not errors and normalize(s_rows, s_cols) != normalize(
                    d_rows, d_cols
                ):
                    errors.append("values differ")
                rec = {
                    "rows_match": rows_ok,
                    "schema_match": schema_ok,
                    "hash_match": not errors,
                    "spark_rows": len(s_rows),
                    "oracle_rows": len(d_rows),
                    "err": "; ".join(errors) or None,
                }
            else:
                s_rows, _, _ = run_spark(spark, qs[name], sf_dir)
                rec = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": len(s_rows),
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
        except Exception as exc:  # noqa: BLE001 — record, don't abort the sweep
            rec = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}"[:500],
            }
        out[name] = rec
        bad = rec["hash_match"] is False
        n_fail += bad
        print(
            f"# {name}: {'FAIL' if bad else 'ok':4s} "
            f"{time.perf_counter() - t0:6.2f}s",
            file=sys.stderr,
        )

    path = os.path.join(REPO, f"LOCAL_CORRECTNESS_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    hash_n = sum(1 for r in out.values() if r["hash_match"] is True)
    rows_only = sum(1 for r in out.values() if r["err"] == "no_oracle")
    print(
        json.dumps(
            {
                "artifact": path,
                "queries": len(out),
                "hash_pass": hash_n,
                "rows_only": rows_only,
                "fail": n_fail,
                "elapsed_sec": round(time.perf_counter() - t_start, 1),
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
