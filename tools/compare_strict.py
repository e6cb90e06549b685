#!/usr/bin/env python3
"""Zero-tolerance variant of compare.py: values must be EXACTLY equal
(floats bit-identical, everything stringified the same way), mirroring the
driver's hash-match gate. Prints the exact diverging value pairs with full
repr + arrow types so parity bugs are diagnosable.

Usage: python3 tools/compare_strict.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string form, the way a hash gate would see the value."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(sf_dir, out_dir, only):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = out / name
        files = sorted(res_dir.glob("*.parquet")) if res_dir.exists() else []
        if not files:
            print(f"MISSING {name}")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
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
        s_rows = sorted(tuple(canon(x) for x in r)
                        for r in zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
        d_rows = sorted(tuple(canon(x) for x in r)
                        for r in zip(*[duck.column(c).to_pylist() for c in d_cols]))
        if len(s_rows) != len(d_rows):
            print(f"ROWS {name}: spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = []
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for c, sv, dv in zip(s_cols, sr, dr):
                if sv != dv:
                    bad.append((i, c, sv, dv))
        if bad:
            st = {f.name: str(f.type) for f in spark_tbl.schema}
            dt = {f.name: str(f.type) for f in duck.schema}
            print(f"VALUES {name}: {len(bad)} diverging cells")
            for i, c, sv, dv in bad[:8]:
                print(f"  row {i} col {c} [spark:{st[c]} duck:{dt[c]}]: "
                      f"spark={sv!r} duck={dv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail (strict)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
