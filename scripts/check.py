#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[<name>] in DuckDB with views named after
the test tables. Compares row count, column names, and value hashes
(column-name-sorted, row-sorted, floats rounded to 9 significant-ish
decimals) — strictness ≥ the driver's, so a pass here should pass there.

Dev tool only — the Scala engine does not depend on this.
"""
import json, sys, math
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # collapse -0.0 vs 0.0
        return format(v, ".10g")  # significant digits, not decimal places
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sq = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            s_cols = [d[0] for d in sq.description]
            s_rows = sq.fetchall()
            oq = con.execute(sql)
            o_cols = [d[0] for d in oq.description]
            o_rows = oq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if cs != co:
            bad = next(i for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {cs[bad][:300]}")
            print(f"  oracle: {co[bad][:300]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
