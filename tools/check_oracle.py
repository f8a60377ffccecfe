#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:  python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, sorts columns by name and rows by all columns, and
compares values. Exit 1 on any mismatch. This is a dev tool only — the
library itself has no Python dependency.
"""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _norm_type(t: pa.DataType) -> str:
    """Canonical type label for the driver-parity strict check.

    The driver's hash is type-sensitive: DuckDB HUGEINT (arrow decimal128)
    vs Spark BIGINT, or BIGINT vs Spark INT, both flip the hash even when
    values are identical. Normalize only flavors that genuinely hash the
    same (timestamp unit/tz, string vs large_string, list vs large_list).
    """
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_norm_type(t.value_type)}>"
    return str(t)


def type_check(name, spark_files, arrow_exp: pa.Table):
    """Compare Spark parquet schema vs DuckDB arrow result column types."""
    sp = pq.read_schema(spark_files[0])
    exp_fields = {f.name: f.type for f in arrow_exp.schema}
    errs = []
    for f in sp:
        if f.name not in exp_fields:
            continue
        a, b = _norm_type(f.type), _norm_type(exp_fields[f.name])
        if a != b:
            errs.append(f"col={f.name}: spark={a} oracle={b}")
    return "; ".join(errs) if errs else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # unify timestamp flavors (tz-aware vs naive, ns vs us)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def compare(name, got, exp):
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA mismatch: spark={list(got.columns)} oracle={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS mismatch: spark={len(got)} oracle={len(exp)}"
    for c in got.columns:
        a, b = got[c], exp[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float).to_numpy(); bf = b.astype(float).to_numpy()
            exact = np.array_equal(af, bf, equal_nan=True)
            close = np.allclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not exact:
                tag = "FLOAT not bit-exact (close)" if close else "VALUE mismatch"
                i = int(np.argmax(~(np.isclose(af, bf, rtol=0, atol=0) | (pd.isna(af) & pd.isna(bf)))))
                return f"{tag} col={c} row={i}: spark={af[i]!r} oracle={bf[i]!r}"
        else:
            eq = (a.astype(str).where(~a.isna(), "<NA>") == b.astype(str).where(~b.isna(), "<NA>"))
            if not eq.all():
                i = int((~eq).idxmax())
                return f"VALUE mismatch col={c} row={i}: spark={a[i]!r} oracle={b[i]!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])
    fails = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            status = "OK(rows-only)" if len(got) > 0 else "FAIL(empty, no oracle)"
            if "FAIL" in status: fails += 1
            print(f"{status:28s} {name} rows={len(got)}")
            continue
        try:
            arrow_exp = con.execute(oracles[name]).fetch_arrow_table()
            exp = arrow_exp.to_pandas()
        except Exception as e:
            print(f"{'FAIL(oracle-sql-error)':28s} {name}: {e}")
            fails += 1
            continue
        err = compare(name, got, exp) or type_check(name, files, arrow_exp)
        if err:
            print(f"{'FAIL':28s} {name}: {err}")
            fails += 1
        else:
            print(f"{'OK':28s} {name} rows={len(got)}")
    print(f"\n{len(names)} queries, {fails} failures")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
