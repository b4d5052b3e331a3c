"""Driver-style oracle comparison: run every __ray_entry__ query against its
DuckDB oracle SQL and compare rows/schema/value-hash (the harness the
driver's CORRECTNESS gate uses, reproduced locally).

Usage:
    python tools/oracle_check.py [sf_dir] [query1,query2,...]
    # defaults: /root/testdata/sf0.01, all queries
    # rm -rf /tmp/icser_cache first for a cold run
"""
import hashlib
import importlib.util
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import os
_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "__ray_entry__.py")
spec = importlib.util.spec_from_file_location("__ray_entry__", _ENTRY)
E = importlib.util.module_from_spec(spec)
spec.loader.exec_module(E)

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF}/{t}.parquet')")
    except Exception:
        pass

def to_table(x):
    if isinstance(x, pa.Table):
        return x
    if hasattr(x, "iter_batches"):
        bs = [b for b in x.iter_batches(batch_format="pyarrow") if b.num_rows]
        return pa.concat_tables([b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in bs]) if bs else pa.table({})
    if isinstance(x, pd.DataFrame):
        return pa.Table.from_pandas(x)
    raise TypeError(type(x))

def vhash(tbl: pa.Table) -> str:
    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()[:12]

qs = E.queries()
oracles = E.oracle_sql()
if ONLY:
    unknown = [n for n in ONLY if n not in qs]
    if unknown:
        print(f"FATAL: unknown query names {unknown}; known: {sorted(qs)}")
        ray.shutdown()
        sys.exit(2)
fails = 0
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        mine = to_table(fn(SF))
    except Exception as ex:
        print(f"{name}: ERROR {ex!r}")
        fails += 1
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"{name}: rows={mine.num_rows} ({dt:.1f}s) [no_oracle]")
        continue
    otbl = con.execute(oracles[name]).arrow()
    rows_ok = mine.num_rows == otbl.num_rows
    schema_ok = sorted(mine.column_names) == sorted(otbl.column_names)
    h_ok = vhash(mine) == vhash(otbl) if rows_ok and schema_ok else False
    status = "OK" if (rows_ok and schema_ok and h_ok) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{name}: {status} rows={mine.num_rows}/{otbl.num_rows} schema={schema_ok} hash={h_ok} ({dt:.1f}s)")
ray.shutdown()
sys.exit(1 if fails else 0)
