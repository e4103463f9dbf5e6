#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) DIRECTLY via
pyarrow/pandas — NOT through DuckDB. Round-tripping the Spark side
through DuckDB was the r13 blind spot: DuckDB coerced DECIMAL(38,0) to
float64 on BOTH sides, hiding exactly the decimal-emit class the driver
compare is sensitive to (14 ops locally green, driver red). The oracle
side still materializes through DuckDB .df() (so HUGEINT -> float64
coercion is visible exactly as the driver sees it), columns are sorted
by name, rows sorted, and values compared
dtype-faithfully — an int64 1000 does NOT equal a float64 1000.0, and
floats are compared via repr (bit-faithful, -0.0 != 0.0). Columns whose
values are arrays/ndarrays are reported as driver-incompatible (the
driver's pandas row sort throws on them).

Dev tool only — the Scala engine does not depend on this.
"""
import datetime, decimal, glob, json, sys, math
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd


def read_spark(spark_dir):
    """Spark result read the driver's way: pyarrow, not DuckDB — decimal
    columns surface as decimal.Decimal objects and fail norm(). Date
    columns (pyarrow date32 -> datetime.date objects) are normalized to
    datetime64 so they compare against DuckDB's DATE materialization."""
    parts = sorted(glob.glob(str(Path(spark_dir) / "*.parquet")))
    df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True) \
        if parts else pd.read_parquet(spark_dir)
    for c in df.columns:
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date) \
                    and not isinstance(nn.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
    return df

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Dtype-tagged canonical form. Int and float never collapse."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "f:NaN"
        return "f:" + repr(f)  # repr is bit-faithful; keeps -0.0 vs 0.0
    if isinstance(v, (np.bool_, bool)):
        return "b:" + str(bool(v))
    if isinstance(v, (np.integer, int)):
        return "i:" + str(int(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        raise TypeError("array-typed value (driver-incompatible)")
    if isinstance(v, decimal.Decimal):
        # DuckDB versions differ in whether .df() materializes DECIMAL
        # as decimal.Decimal objects or float64 — a decimal-typed EMIT
        # therefore hashes differently across driver versions even when
        # the values agree (the r7 etl_dirty_replay red row). House
        # rule: decimals are intermediates only; emit DOUBLE/BIGINT.
        raise TypeError("decimal-typed value (emit DOUBLE or BIGINT instead; "
                        "DuckDB-version-sensitive in the driver compare)")
    if isinstance(v, pd.Timestamp):
        return "t:" + v.isoformat()
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return "s:" + str(v)


def canon(df):
    # per-COLUMN normalization: iterrows() materializes each row as a
    # Series, upcasting int64 to float64 whenever the row mixes numeric
    # dtypes — which would silently collapse exactly the int-vs-float
    # distinction this tool exists to catch. Series.tolist() keeps each
    # column's dtype (int64 -> int, float64 -> float).
    cols = sorted(df.columns)
    col_vals = [[norm(v) for v in df[c].tolist()] for c in cols]
    rows = ["|".join(vals) for vals in zip(*col_vals)]
    return sorted(rows)


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
            s_df = read_spark(spark_dir)
            o_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(s_df.columns) != sorted(o_df.columns):
            print(f"FAIL {name}: cols spark={sorted(s_df.columns)} "
                  f"oracle={sorted(o_df.columns)}")
            n_fail += 1
            continue
        if len(s_df) != len(o_df):
            print(f"FAIL {name}: rows spark={len(s_df)} oracle={len(o_df)}")
            n_fail += 1
            continue
        try:
            cs, co = canon(s_df), canon(o_df)
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if cs != co:
            bad = next(i for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {cs[bad][:300]}")
            print(f"  oracle: {co[bad][:300]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_df)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
