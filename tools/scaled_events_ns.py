#!/usr/bin/env python3
"""Restore TIMESTAMP(NANOS) typing on a PerfProbe-buildScaled corpus.

The driver corpora store events.ts as parquet TIMESTAMP(NANOS); Spark
reads it as ns-epoch BIGINT (spark.sql.legacy.parquet.nanosAsLong) and
buildScaled therefore WRITES the scaled copy as plain INT64 — the engine
sees identical values either way, but DuckDB then binds ts as BIGINT and
every oracle using epoch_ns(ts) fails. This rewrites the scaled events
table as one ns-typed parquet file (what a driver corpus looks like);
Spark reads the result back as the same longs.

Usage: tools/scaled_events_ns.py <scaled_corpus_dir>
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.dataset as ds
import pyarrow.parquet as pq

src = sys.argv[1]
path = f"{src}/events.parquet"
t = ds.dataset(path, format="parquet").to_table()
i = t.schema.get_field_index("ts")
assert t.schema.field(i).type == pa.int64(), \
    f"events.ts is {t.schema.field(i).type}, expected int64 (already converted?)"
t = t.set_column(i, pa.field("ts", pa.timestamp("ns")),
                 t.column(i).cast(pa.timestamp("ns")))
shutil.rmtree(path)
# parquet 2.6 keeps nanosecond precision (older versions coerce to us)
pq.write_table(t, path, version="2.6")
print(f"rewrote {path}: {t.num_rows} rows, ts -> timestamp[ns]")
