#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:  python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, sorts columns by name and rows by all columns, and
compares values. Exit 1 on any mismatch. This is a dev tool only — the
library itself has no Python dependency.
"""
import sys, os, json, glob, re
import duckdb, pandas as pd, numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _norm_type(t: pa.DataType) -> str:
    """Canonical type label for the driver-parity strict check.

    The driver's hash is type-sensitive: DuckDB HUGEINT (arrow decimal128)
    vs Spark BIGINT, or BIGINT vs Spark INT, both flip the hash even when
    values are identical. Normalize only flavors that genuinely hash the
    same (timestamp UNIT, string vs large_string, list vs large_list).
    Timestamp TZ-awareness is NOT collapsed: a tz-aware value renders with
    an offset suffix, so a naive-vs-aware pair can hash differently on the
    driver even when the instants match (round-11 lesson: the replica must
    be at least as strict as the driver on value flavors).
    """
    if pa.types.is_timestamp(t):
        return "timestamp[tz]" if t.tz is not None else "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_norm_type(t.value_type)}>"
    return str(t)


# Oracle-SQL lint: engine-native double->DECIMAL rounding is midpoint-
# sensitive, and different DuckDB point releases round a double like
# 12345.675 differently at scale <= 2 (round-11's q332: rows/schema green,
# hash red on the driver, green locally). The repo convention is either
# scale >= 6 (price-like doubles never land on a midpoint at the 6th
# decimal) or exact integer cents first (floor(x*100+0.5) AS BIGINT, then
# an exact decimal rescale). Anything else is a latent version-portability
# red row and fails the local gate BEFORE it ships.
_DEC_CAST = re.compile(
    r"CAST\s*\((?P<inner>[^()]*(?:\([^()]*(?:\([^()]*\)[^()]*)*\)[^()]*)*?)"
    r"\s+AS\s+DECIMAL\s*\(\s*\d+\s*,\s*(?P<scale>\d+)\s*\)", re.I)

# Audited exceptions: casts the regex cannot prove exact but a human has
# verified the operand is integer-valued (integer->DECIMAL never rounds).
_LINT_ALLOW = {
    "t178_char_entropy",  # CAST(c AS DECIMAL(18,3)) where c = count(*)
}

def lint_oracle_sql(name, sql):
    if name in _LINT_ALLOW:
        return None
    errs = []
    for m in _DEC_CAST.finditer(sql):
        scale, inner = int(m.group("scale")), m.group("inner")
        if scale >= 6:
            continue
        # floor-scale convention: operand already exact integer units
        if re.search(r"AS\s+(BIG)?INT", inner, re.I):
            continue
        errs.append(
            f"midpoint-sensitive CAST(.. AS DECIMAL(p,{scale})) on "
            f"'{' '.join(inner.split())[:60]}' — use scale>=6 or exact "
            f"integer cents (floor-scale) per OracleSafe")
    return "; ".join(errs) if errs else None


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

def _tz_flavor(df: pd.DataFrame):
    """Per-column tz-awareness map (True = tz-aware datetime)."""
    return {c: isinstance(df[c].dtype, pd.DatetimeTZDtype) for c in df.columns
            if pd.api.types.is_datetime64_any_dtype(df[c])}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # unify timestamp UNIT only; tz flavor is checked separately and a
        # naive-vs-aware mismatch FAILS (driver value-flavor strictness)
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def compare(name, got, exp):
    gflav, eflav = _tz_flavor(got), _tz_flavor(exp)
    for c in sorted(set(gflav) | set(eflav)):
        if gflav.get(c, False) != eflav.get(c, False):
            return (f"TS flavor mismatch col={c}: spark tz-aware={gflav.get(c)} "
                    f"oracle tz-aware={eflav.get(c)} — may hash differently on the driver")
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
        err = (lint_oracle_sql(name, oracles[name])
               or compare(name, got, exp) or type_check(name, files, arrow_exp))
        if err:
            print(f"{'FAIL':28s} {name}: {err}")
            fails += 1
        else:
            print(f"{'OK':28s} {name} rows={len(got)}")
    print(f"\n{len(names)} queries, {fails} failures")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
