#!/usr/bin/env python3
"""Oracle dtype audit: run every oracle in oracle_sql.json through DuckDB's
ARROW path (the driver reads results via arrow/pandas, NOT fetchall) and
compare each column's arrow type family against the Spark parquet written by
graft.Verify. Dev tool only.

Catches the class of bug where VALUES match under fetchall() (HUGEINT ->
Python int) but the driver's hash of the arrow buffer differs (HUGEINT ->
decimal128(38,0) vs Spark's int64). Any decimal128 column in an oracle is an
automatic FLAG — DuckDB only produces it from un-CAST sum()/list_sum() over
BIGINT, and Spark never emits it from our queries.

Usage: python3 tools/typecheck.py <sfDir> <verifyOutDir>
Exit nonzero if any query has a family mismatch or a decimal column.
"""
import sys, glob, json, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def family(t: pa.DataType) -> str:
    if pa.types.is_decimal(t):
        # the driver reads DuckDB results through the pandas path, where any
        # DECIMAL (incl. HUGEINT = decimal128(38,0) from un-CAST list_sum /
        # sum over BIGINT) becomes float64 — so its hash family is "float".
        # An int column on the Spark side then mismatches ("123" vs "123.0").
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "time"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + family(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        o_types = {f.name: f.type for f in tbl.schema}
        bad = []
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if files:
            s_schema = pq.read_schema(files[0])
            s_types = {f.name: f.type for f in s_schema}
            if set(s_types) != set(o_types):
                bad.append(f"column sets differ: spark={sorted(s_types)} "
                           f"oracle={sorted(o_types)}")
            else:
                for c in sorted(o_types):
                    fo, fs = family(o_types[c]), family(s_types[c])
                    # null-typed oracle columns (all-NULL result) can't be
                    # classified; let value compare handle them
                    if fo != fs and "null" not in (fo, fs):
                        bad.append(f"{c}: spark={s_types[c]}({fs}) "
                                   f"oracle={o_types[c]}({fo})")
        if bad:
            n_bad += 1
            print(f"FLAG     {name}")
            for b in bad:
                print(f"         {b}")
    print(f"typecheck: {len(oracles) - n_bad} clean, {n_bad} flagged")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
