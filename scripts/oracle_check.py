#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, and compares:
row count, column names (sorted), and exact values after sorting columns
by name. Exit code 1 if any query mismatches.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string for one value, preserving decimal scale and
    integer-ness (float32 is promoted to float64 first, matching the
    driver's coercion layer)."""
    import numpy as np
    if v is None:
        return "\x00NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        return "\x00NULL" if f != f else repr(f)
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "\x00NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures, passed, no_oracle = [], [], []
    # a query that errored in Verify leaves no output dir — that is a FAIL,
    # not a silent skip (the driver counts it against correctness)
    present = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
               if os.path.isdir(d)}
    declared = set(oracles)
    manifest = os.path.join(out_dir, "queries.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            declared |= set(json.load(f))
    for name in sorted(declared - present):
        failures.append((name, "no Verify output (query raised — see stderr)"))
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        spark_tbl = pq.ParquetDataset(files).read() if files else None
        spark_df = spark_tbl.to_pandas() if spark_tbl is not None else pd.DataFrame()
        # Driver-parity guard: the driver row-sorts with pandas before
        # hashing and nested (list/struct/map) cells are unhashable there
        # — any gate emitting one fails at the driver even if the values
        # match. Fail it here too, before a round burns on it again.
        if spark_tbl is not None:
            import pyarrow as pa
            nested = [f.name for f in spark_tbl.schema if pa.types.is_nested(f.type)]
            if nested:
                failures.append((name, f"non-scalar output columns {nested} — "
                                 "serialize with array_join/to_json in both engines"))
                continue
        if name not in oracles:
            no_oracle.append((name, len(spark_df)))
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            failures.append((name, f"columns spark={list(s.columns)} duck={list(d.columns)}"))
            continue
        if len(s) != len(d):
            failures.append((name, f"rowcount spark={len(s)} duck={len(d)}"))
            continue
        # Row-sort both frames on the canonicalized values before the
        # compare, like the driver does (round-5 verdict item 2): equal
        # multisets of canonical tuples compare equal regardless of each
        # engine's ORDER BY tie-breaking; a positional compare would both
        # miss driver failures and flag spurious tie-order diffs.
        try:
            s_key = pd.DataFrame({c: s[c].map(canon) for c in s.columns})
            d_key = pd.DataFrame({c: d[c].map(canon) for c in d.columns})
            cols = list(s.columns)
            s_ord = s_key.sort_values(cols, kind="mergesort").index if cols else s_key.index
            d_ord = d_key.sort_values(cols, kind="mergesort").index if cols else d_key.index
            s, d = s.loc[s_ord].reset_index(drop=True), d.loc[d_ord].reset_index(drop=True)
            s_key = s_key.loc[s_ord].reset_index(drop=True)
            d_key = d_key.loc[d_ord].reset_index(drop=True)
        except Exception as e:
            failures.append((name, f"row-sort error (driver would fail too): {e}"))
            continue
        diffs = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                # Dtype-strict canonical-string compare: a Decimal stays
                # '100.50' while float64 is '100.5', int64 is '1' while
                # float64 is '1.0' — exactly the divergences the driver's
                # value hash sees. No float coercion before comparing.
                eq = s_key[c] == d_key[c]
                if not bool(eq.all()):
                    bad = (~eq).idxmax()
                    diffs.append(
                        f"col {c} row {bad}: spark={sv[bad]!r} ({sv.dtype}) "
                        f"duck={dv[bad]!r} ({dv.dtype})")
            except Exception as e:
                diffs.append(f"col {c}: compare error {e}")
        if diffs:
            failures.append((name, "; ".join(diffs[:3])))
        else:
            passed.append(name)

    for n in passed:
        print(f"PASS  {n}")
    for n, rows in no_oracle:
        print(f"NOORACLE  {n} rows={rows}" + ("  !! EMPTY" if rows == 0 else ""))
    for n, msg in failures:
        print(f"FAIL  {n}: {msg}")
    print(f"\n{len(passed)} pass, {len(no_oracle)} rows-only, {len(failures)} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
