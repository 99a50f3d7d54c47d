#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet.  Compares: columns sorted by name, rows sorted
by all columns, exact cell equality.  Prints PASS/FAIL per query.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse IEEE signed zero: -0.0 == 0.0 but str() differs
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def type_key(arrow_type):
    """Normalize an arrow type for driver-equivalent strictness: the
    driver's hash compare tolerates int width differences (int32 vs
    int64 both passed round 1) but NOT decimal-vs-int (DuckDB HUGEINT
    sums surfaced as decimal128 and hash-mismatched round 1)."""
    s = str(arrow_type)
    if s.startswith(("int", "uint")):
        return "int"
    if s in ("float", "double", "halffloat"):
        return "float"
    if s.startswith("list<") or s.startswith("large_list<"):
        return "list"
    if s in ("string", "large_string"):
        return "string"
    return s


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = skipped = 0
    # Verify writes the set of queries it ATTEMPTED: a missing dump for
    # an attempted query is a crash → hard FAIL; a query absent from the
    # manifest was filtered out in the dev loop → skip. Without a
    # manifest (older dumps), every missing dir is a FAIL.
    attempted = None
    manifest = f"{out_dir}/attempted.json"
    if os.path.exists(manifest):
        with open(manifest) as f:
            attempted = set(json.load(f))
    for name in sorted(oracle):
        sql = oracle[name]
        if not os.path.isdir(f"{out_dir}/{name}"):
            if attempted is not None and name not in attempted:
                skipped += 1  # filtered out, not attempted
                continue
            print(f"FAIL {name}: attempted but no result dumped (query crashed in Verify)")
            n_fail += 1
            continue
        spark_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        try:
            # NOTE: re-execute per consumption — duckdb re-uses one
            # result set per connection, so interleaving .arrow() and
            # .fetchall() on the same execute() silently yields []
            o_schema = con.execute(sql).arrow().schema
            o_cols = list(o_schema.names)
            o_types = {f.name: type_key(f.type) for f in o_schema}
            o_rows = con.execute(sql).fetchall()
            s_schema = con.execute(spark_sql).arrow().schema
            s_cols = list(s_schema.names)
            s_types = {f.name: type_key(f.type) for f in s_schema}
            s_rows = con.execute(spark_sql).fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        oc, orows = canon(o_rows, o_cols)
        sc, srows = canon(s_rows, s_cols)
        tdiff = {k: (o_types.get(k), s_types.get(k))
                 for k in set(o_types) | set(s_types)
                 if o_types.get(k) != s_types.get(k)}
        if tdiff:
            print(f"FAIL {name}: types differ {tdiff}")
            n_fail += 1
        elif oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_fail += 1
        elif len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} "
                  f"spark={len(srows)}")
            n_fail += 1
        elif orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows))
                       if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:\n"
                  f"  oracle: {orows[bad]}\n  spark:  {srows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    note = f" ({skipped} not dumped)" if skipped else ""
    print(f"== {n_pass} pass / {n_fail} fail =={note}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
