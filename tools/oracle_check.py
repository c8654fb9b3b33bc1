#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark's output), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views
over <sfDir>/*.parquet, and compares: row count, sorted column names,
and exact cell values after sorting rows. Exit 1 if any query diverges.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures = []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no spark output parquet")); continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        if name not in oracle:
            print(f"[rows-only] {name}: {got.num_rows} rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}")); continue

        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            failures.append((name, f"columns differ: {g_cols} vs {e_cols}"))
            continue
        # Arrow TYPE equality per column — the driver's hash is typed,
        # so a DuckDB HUGEINT (decimal128) vs Spark int64 mismatch is a
        # driver-red even when every value compares equal in Python.
        type_diffs = []
        for c in g_cols:
            gt = got.schema.field(c).type
            et = exp.schema.field(c).type
            if gt != et:
                type_diffs.append(f"{c}: spark={gt} duckdb={et}")
        if type_diffs:
            failures.append((name, "arrow types differ: "
                             + "; ".join(type_diffs)))
            continue
        if got.num_rows != exp.num_rows:
            failures.append(
                (name, f"row count {got.num_rows} vs {exp.num_rows}"))
            continue
        g = got.select(g_cols).to_pylist()
        e = exp.select(g_cols).to_pylist()
        key = lambda r: tuple(
            (str(type(v)), str(v)) for v in (r[c] for c in g_cols))
        g.sort(key=key); e.sort(key=key)
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            for c in g_cols:
                gv, ev = gr[c], er[c]
                if gv != ev:
                    bad = (i, c, gv, ev); break
            if bad: break
        if bad:
            failures.append((name, f"first diff row {bad[0]} col {bad[1]}: "
                             f"spark={bad[2]!r} duckdb={bad[3]!r}"))
        else:
            print(f"[PASS] {name}: {got.num_rows} rows")

    for name, why in failures:
        print(f"[FAIL] {name}: {why}")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
