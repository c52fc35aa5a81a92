#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Dtype-STRICT: the driver's hash is representation-sensitive, so this gate
compares PANDAS dtype classes column-by-column (after the same conversions
the driver performs: spark parquet -> pandas, duckdb .df()) BEFORE comparing
values, and fails on any class drift. The round-4 lesson: DuckDB
`sum(BIGINT) OVER` widens to HUGEINT, which .df() converts to float64 while
Spark emits int64 — values str()-equal, driver hash differs. ALWAYS CAST
oracle aggregates.

Documented benign mappings (what pandas conversion already collapses —
verified empirically, these pass at the driver):
  - DuckDB DATE -> datetime64, so date-vs-timestamp is one "datetime" class
  - DuckDB DECIMAL(p,s) -> float64, so decimal-vs-double is "float"
  - integer widths are one class (int8..64, uint)
Failures (driver hash mismatches even when stringified values agree):
  - int vs float (the HUGEINT case)
  - any other class pair (bool/str/bytes/list/struct/decimal-object)
"""
import sys, json, glob, math, datetime, decimal
import numpy as np
import pandas.api.types as pt
import duckdb
import pyarrow.parquet as pq


def dtype_class(series):
    dt = series.dtype
    if pt.is_bool_dtype(dt):
        return "bool"
    if pt.is_integer_dtype(dt):
        return "int"
    if pt.is_float_dtype(dt):
        return "float"
    if pt.is_datetime64_any_dtype(dt):
        return "datetime"
    if pt.is_timedelta64_dtype(dt):
        return "timedelta"
    # object column: classify by the first non-null value
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, decimal.Decimal):
            return "decimal-object"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, datetime.datetime):
            return "datetime"
        if isinstance(v, datetime.date):
            return "datetime"  # driver-side pandas collapses date into datetime
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, dict):
            return "struct"
        return type(v).__name__
    return "all-null"


def class_mismatch(a, b):
    if a == "all-null" or b == "all-null":
        return False
    return a != b


def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(sorted(files)).to_pandas(date_as_object=False)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}"); n_fail += 1; continue
        # dtype gate BEFORE value compare (see module docstring)
        dtype_bad = []
        for c in gcols:
            gc, ec = dtype_class(got[c]), dtype_class(exp[c])
            if class_mismatch(gc, ec):
                dtype_bad.append((c, gc, ec))
        if dtype_bad:
            c, a, b = dtype_bad[0]
            print(f"FAIL {name}: dtype col={c}: spark={a} oracle={b} "
                  f"(driver hash is representation-sensitive — CAST the oracle)")
            n_fail += 1; continue
        g = got[gcols].sort_values(gcols, kind="mergesort").reset_index(drop=True)
        e = exp[ecols].sort_values(ecols, kind="mergesort").reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = []
        for c in gcols:
            gv, ev = g[c], e[c]
            for i in range(len(gv)):
                a, b = gv.iloc[i], ev.iloc[i]
                if a is None and b is None:
                    continue
                try:
                    if isinstance(a, float) or isinstance(b, float):
                        fa, fb = float(a), float(b)
                        if fa != fb and not (math.isnan(fa) and math.isnan(fb)):
                            bad.append((c, i, a, b)); break
                    elif str(a) != str(b):
                        bad.append((c, i, a, b)); break
                except Exception:
                    bad.append((c, i, a, b)); break
        if bad:
            c, i, a, b = bad[0]
            print(f"FAIL {name}: first diff col={c} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
