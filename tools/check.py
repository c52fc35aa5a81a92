#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    tbl = pq.read_table(sorted(files)[0])
    return tbl.to_pandas(date_as_object=False)

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
