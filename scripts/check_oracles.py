#!/usr/bin/env python3
"""Local oracle parity check, mirroring the driver's compare: for each
entry in <outDir>/oracle_sql.json, run the SQL in DuckDB over the
testdata parquet tables and compare against the Spark parquet dump at
<outDir>/<name>/ — columns sorted by name, rows sorted, floats rounded.

Usage: python3 scripts/check_oracles.py <sfDir> <outDir> [name...]
"""
import duckdb, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        return v

    out = [tuple(cv(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sql = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
        except Exception:
            pass
    bad = []
    names = sorted(n for n in sql if not only or n in only)
    for name in names:
        try:
            cur = con.execute(sql[name])
            ocols = [d[0].lower() for d in cur.description]
            orows = cur.fetchall()
            cur = con.execute(
                f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')")
            scols = [d[0].lower() for d in cur.description]
            srows = cur.fetchall()
        except Exception as e:
            bad.append((name, f"err: {e}"))
            continue
        if sorted(ocols) != sorted(scols):
            bad.append((name, f"schema: oracle {sorted(ocols)} vs spark {sorted(scols)}"))
        elif canon(orows, ocols) != canon(srows, scols):
            o, s = canon(orows, ocols), canon(srows, scols)
            diff = next((i for i in range(min(len(o), len(s))) if o[i] != s[i]),
                        min(len(o), len(s)))
            bad.append((name, f"rows: {len(orows)} vs {len(srows)}; first diff @{diff}: "
                        f"{o[diff] if diff < len(o) else '∅'} vs {s[diff] if diff < len(s) else '∅'}"))
    print(f"checked {len(names)}: {len(names) - len(bad)} pass, {len(bad)} fail")
    for n, why in bad:
        print(f"  FAIL {n}: {why}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
