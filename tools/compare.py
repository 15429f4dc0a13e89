#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables. Dev tool only (not part
of the shipped Scala library).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--strict]

--strict additionally counts BIT-different float64s per query (struct.pack
'>d' byte comparison after round-6, the driver's hash input) and reports any
query with a nonzero count — the driver hashes exactly, so a row that passes
the tolerance check but differs in bits is a driver-red in waiting.
"""
import sys, glob, os, math, json, struct
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows; round floats
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)  # float tolerance
            if isinstance(v, bool):
                v = int(v)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [sorted(cols)] + out

def bitdiff(a, b):
    """count of float64 cells whose round-6 values differ in IEEE bits"""
    n = 0
    for x, y in zip(a, b):
        for u, v in zip(x, y):
            if isinstance(u, float) and isinstance(v, float):
                if math.isnan(u) and math.isnan(v):
                    continue
                if struct.pack('>d', u) != struct.pack('>d', v):
                    n += 1
            elif u != v:
                n += 1
    return n

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    strict = "--strict" in sys.argv[3:]
    bits = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        d = f"{outdir}/{name}"
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_bad += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})")
            got_cols = [c[0] for c in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [c[0] for c in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"SCHEMA   {name}: spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_bad += 1
            continue
        a, b = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if len(a) != len(b):
            print(f"ROWCOUNT {name}: spark={len(a)-1} oracle={len(b)-1}")
            n_bad += 1
            continue
        diffs = [(x, y) for x, y in zip(a[1:], b[1:]) if x != y]
        # float-tolerant elementwise recheck for rows that differ
        real = []
        for x, y in diffs:
            bad = False
            for u, v in zip(x, y):
                if isinstance(u, float) and isinstance(v, float):
                    # values were already rounded to 6 digits; allow adjacent
                    # rounding boundaries (summation-order divergence)
                    if not math.isclose(u, v, rel_tol=1e-4, abs_tol=2e-6):
                        bad = True
                elif u != v:
                    bad = True
            if bad:
                real.append((x, y))
        if real:
            print(f"VALUES   {name}: {len(real)} differing rows; first: {real[0]}")
            n_bad += 1
        else:
            if strict:
                nb = bitdiff(a[1:], b[1:])
                bits[name] = nb
                tag = f"  [{nb} bit-diff float64s]" if nb else ""
                print(f"OK       {name} ({len(a)-1} rows){tag}")
            else:
                print(f"OK       {name} ({len(a)-1} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    if strict:
        hot = {k: v for k, v in bits.items() if v}
        print(f"strict: {len(hot)} queries with bit-diffs "
              f"({sum(hot.values())} cells): {hot or '{}'}")
        json.dump(bits, open(f"{outdir}/bitdiffs.json", "w"), indent=1)
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
