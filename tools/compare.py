#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py [--tolerant] <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir (Spark parquet result) with an entry in
oracle_sql.json, runs the oracle SQL in DuckDB (tables = parquet files in
sfDir), sorts columns by name, sorts rows, and compares values.

Default mode is STRICT, mirroring the driver's hash gate: every value is
compared by its exact string repr with NO float tolerance and NO cross-type
coercion beyond str() — so Decimal('228.40') != 228.4 (trailing zero),
0.30000000000000004 != 0.3, and a DECIMAL column vs a DOUBLE column fails
even when the numbers are "equal". If strict passes locally, the driver's
hash compare passes. --tolerant restores the old 1e-9-relative float compare
for debugging whether a failure is value-level or formatting-level.
"""
import datetime as _dt
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def values_equal_tolerant(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def strict_repr(v):
    """Exact repr the way a hash gate would see it: str() of the raw value.

    str(float) is repr(float) in py3 (shortest round-trip), str(Decimal)
    preserves scale ('228.40'), None becomes the '\\x00NULL' sentinel (so a
    genuine NULL never collides with the string 'None'). No normalization
    on purpose.
    """
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        # Spark parquet timestamps are UTC-adjusted (tz-aware via pyarrow);
        # DuckDB returns naive datetimes. Driver-green timestamp queries show
        # the gate treats these as the same instant — normalize to naive UTC.
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return str(v)


def main(argv):
    strict = True
    args = [a for a in argv if a != "--tolerant"]
    if len(args) != len(argv):
        strict = False
    unknown = [a for a in args if a.startswith("--")]
    if unknown or len(args) != 2:
        prog = sys.argv[0] if sys.argv else "compare.py"
        msg = f"unknown flags: {' '.join(unknown)}" if unknown \
            else f"expected 2 positional args, got {len(args)}"
        sys.exit(f"usage: {prog} [--tolerant] <sfDir> <verifyOutDir>\n{msg}")
    sf_dir, out_dir = args[0], args[1]
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = out / name
        if not res_dir.exists():
            print(f"MISSING {name}: no Spark output")
            n_fail += 1
            continue
        files = sorted(res_dir.glob("*.parquet"))
        spark_tbl = pq.read_table(files[0]) if files else None
        if spark_tbl is None:
            print(f"MISSING {name}: empty output dir")
            n_fail += 1
            continue
        try:
            duck = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"SCHEMA {name}: spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if strict:
            s_rows = sorted(tuple(strict_repr(x) for x in r)
                            for r in zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
            d_rows = sorted(tuple(strict_repr(x) for x in r)
                            for r in zip(*[duck.column(c).to_pylist() for c in d_cols]))
        else:
            s_rows = sorted(map(tuple, zip(*[spark_tbl.column(c).to_pylist() for c in s_cols])), key=str)
            d_rows = sorted(map(tuple, zip(*[duck.column(c).to_pylist() for c in d_cols])), key=str)
        if len(s_rows) != len(d_rows):
            print(f"ROWS {name}: spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for c, sv, dv in zip(s_cols, sr, dr):
                ok = (sv == dv) if strict else values_equal_tolerant(sv, dv)
                if not ok:
                    bad = (i, c, sv, dv)
                    break
            if bad:
                break
        if bad:
            print(f"VALUES {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    mode = "strict" if strict else "tolerant"
    print(f"\n[{mode}] {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
