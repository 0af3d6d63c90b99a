#!/usr/bin/env python3
"""Rewrite a ScaleUp-produced events.parquet into the driver's exact layout:
a single file whose `ts` column is parquet TIMESTAMP(NANOS) — the one layout
that satisfies BOTH consumers (Spark reads NANOS as a raw long under
spark.sql.legacy.parquet.nanosAsLong=true, matching the streaming lanes'
fixed bigint schema; DuckDB reads it natively as a timestamp for the
oracles). Spark cannot write nanos timestamps and DuckDB 1.0's parquet
writer downgrades TIMESTAMP_NS to micros, hence pyarrow.

Usage: python3 tools/nanosify_events.py <sf_dir>
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq

def main(sf_dir):
    src = f"{sf_dir}/events.parquet"
    tmp = f"{sf_dir}/events_ns.parquet"
    t = pq.read_table(src)
    ts = t.column("ts")
    # ScaleUp emits either INT96/µs timestamps or (older builds) raw nanos
    # BIGINT; normalize both to timestamp[ns].
    if pa.types.is_timestamp(ts.type):
        ts_ns = ts.cast(pa.timestamp("ns"))
    else:  # int64 nanos
        ts_ns = ts.cast(pa.timestamp("ns"))
    idx = t.schema.get_field_index("ts")
    t = t.set_column(idx, pa.field("ts", pa.timestamp("ns")), ts_ns)
    t = t.sort_by("event_id")
    # Drop Spark's embedded row metadata (org.apache.spark.sql.parquet.row.
    # metadata): it still declares the PRE-rewrite µs timestamp type, and a
    # Spark reader trusts that footer metadata over the physical NANOS
    # annotation — yielding FAILED_READ_FILE.PARQUET_COLUMN_DATA_TYPE_MISMATCH
    # instead of the nanosAsLong long column. The driver's own files carry no
    # such metadata.
    t = t.replace_schema_metadata(None)
    # version>=2.6 keeps NANOS as NANOS (older versions coerce to micros)
    pq.write_table(t, tmp, version="2.6", coerce_timestamps=None,
                   use_deprecated_int96_timestamps=False)
    os.replace(tmp, src)
    meta = pq.read_schema(src)
    print(f"[nanosify] {src}: {t.num_rows} rows, ts = {meta.field('ts').type}")

if __name__ == "__main__":
    main(sys.argv[1])
