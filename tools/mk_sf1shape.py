#!/usr/bin/env python3
"""Build an sf1-SHAPED testdata dir for strict scale sweeps (dev tool only).

10x-replicates the driver's sf0.1 events table to 1,000,000 rows under
distinct event_ids with deterministic per-replica timestamp/value jitter
(same 30-day window and schema), and links the remaining tables unchanged.
This is the corpus the r17/r18 sweeps used for the telemetry spine; the
logs/spans spine derives its lines from this same events table
(graft.model.Cooked.logs), so a 1M-row events store exercises the log
segment writer, fingerprint index, and needle pruning at 10x bench scale.

Usage: tools/mk_sf1shape.py [srcDir] [outDir]
       (defaults /root/testdata/sf0.1 -> /tmp/sf1shape)
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1shape"
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
# 10 replicas, each event_id remapped to a distinct id; ts jittered by a
# deterministic per-(row, replica) offset of 0..9999 ms plus r*13 s so
# replicas spread within the same window instead of stacking on one
# timestamp; value perturbed per replica so formatted log lines are not
# bit-identical across replicas (realistic near-duplicate lines).
con.execute(f"""
COPY (
  SELECT e.event_id * 10 + r.r AS event_id,
         e.ts + to_microseconds(
           (r.r * 13000 + (e.event_id * 2654435761 + r.r * 97) % 10000) * 1000
         ) AS ts,
         e.user_id,
         e.event_type,
         e.value + r.r * 0.01 AS value,
         e.props
  FROM read_parquet('{src}/events.parquet') e
  CROSS JOIN (SELECT unnest(range(10)) AS r) r
  ORDER BY ts
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/events.parquet')") \
    .fetchone()[0]
print(f"events: {n} rows -> {out}/events.parquet")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        shutil.copyfile(f"{src}/{t}.parquet", dst)
print("other tables copied unchanged")
