#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with views over <sfDir>/*.parquet, load the Spark result parquet, sort
columns by name + rows by all columns, and compare values cell-wise
(exact for ints/strings, tolerant 1e-9 relative for floats).
"""
import json, math, os, sys

import duckdb
import pandas as pd


TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to UTC-naive us. tz-aware columns must be
    # CONVERTED to UTC before the tz is stripped: a bare tz_localize(None)
    # keeps the host-local wall clock, so on a non-UTC machine a DuckDB
    # timestamptz result would canonicalize to local time while Spark's
    # UTC-session parquet holds UTC -- a false mismatch.
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        na, nb = pd.isna(a), pd.isna(b)
        # array-valued cells: pd.isna returns an elementwise array whose
        # truthiness would raise; fall through to the sequence branch
        if isinstance(na, bool) and isinstance(nb, bool) and na and nb:
            return True
    except (TypeError, ValueError):
        pass
    # binary cells can arrive as bytes on one side and bytearray/
    # memoryview on the other (engine-dependent); normalize BEFORE the
    # sequence test, which would otherwise zip-compare a bytearray
    # elementwise against bytes and declare equal payloads mismatched
    if isinstance(a, (bytearray, memoryview)):
        a = bytes(a)
    if isinstance(b, (bytearray, memoryview)):
        b = bytes(b)
    # list/array cells (collect_list / DuckDB list()): compare elementwise
    # with the same rules, so a float inside an array keeps its tolerance
    # and the comparison never returns an ambiguous numpy array.
    # POSITIVE detection (list/tuple/ndarray), not hasattr(__len__):
    # the duck test also matched dicts (struct cells — zip iterates KEYS)
    # and any sized container, silently comparing the wrong thing
    import numpy as np
    a_seq = isinstance(a, (list, tuple, np.ndarray))
    b_seq = isinstance(b, (list, tuple, np.ndarray))
    if a_seq or b_seq:
        if not (a_seq and b_seq):
            return False
        if len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    # struct cells: compare as dicts, key-for-key (zip-over-keys would
    # pass structs whose KEY SETS merely matched)
    if isinstance(a, dict) or isinstance(b, dict):
        if not (isinstance(a, dict) and isinstance(b, dict)):
            return False
        if set(a.keys()) != set(b.keys()):
            return False
        return all(cells_equal(a[k], b[k]) for k in a)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # pin the session to UTC so timestamptz results are UTC regardless of
    # the host timezone (the driver's compare runs Spark in a UTC session)
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (e.g. GenScale output) are directories of
        # part files; DuckDB needs a glob for those.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cells_equal(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: exp={a!r} got={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    # queries with no oracle entry -> rows-only check. A filtered Verify
    # run (SPARK_GRAFT_ONLY) writes a FILTERED oracle_sql.json, so a
    # reused out_dir can hold STALE parquet from a prior full run for
    # every unfiltered query; those silently demoting from value-compare
    # to this rows-only branch can read as green. Make the demotion loud.
    stale = 0
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracle:
            continue
        n = len(pd.read_parquet(f"{out_dir}/{name}"))
        print(f"INFO {name}: no oracle, rows={n}")
        stale += 1
    if stale:
        # Verify writes a sidecar BESIDE the out dir recording whether the
        # dump was SPARK_GRAFT_ONLY-filtered. Rows-only queries (dumped but
        # deliberately oracle-less) are a legitimate steady state on FULL
        # runs — only a filtered dump into a reused out_dir makes absent
        # entries mean "stale, unverified". No sidecar (pre-r12 dump or a
        # hand-assembled dir) keeps the loud warning: staleness can't be
        # ruled out.
        meta_path = f"{out_dir.rstrip('/')}.verifymeta.json"
        filtered = True
        surface = None  # current query-surface names, when the sidecar has them
        try:
            meta = json.load(open(meta_path))
            filtered = bool(meta.get("filtered", True))
            if isinstance(meta.get("queries"), list):
                surface = set(meta["queries"])
        except Exception:
            pass
        if filtered:
            print(f"WARN {out_dir} holds {stale} result dir(s) absent from "
                  f"oracle_sql.json — rows-only checked above. If this was a "
                  f"filtered Verify into a reused out_dir, those results are "
                  f"STALE, not verified: use a fresh out_dir.")
        else:
            # a FULL Verify overwrites live queries' dirs but never deletes
            # dirs owned by NO current query (removed/renamed since a prior
            # run into this out_dir) — cross-check against the sidecar's
            # surface list so those stale leftovers stay loud instead of
            # riding the reassuring full-run INFO
            orphans = []
            if surface is not None:
                orphans = sorted(
                    name for name in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, name))
                    and name not in surface)
            if orphans:
                print(f"WARN {out_dir}: {len(orphans)} result dir(s) match NO "
                      f"query on the current surface — stale leftovers of "
                      f"removed/renamed queries in a reused out_dir, not "
                      f"verified: {', '.join(orphans)}. Use a fresh out_dir.")
            elif surface is None:
                print(f"WARN {out_dir}: {stale} result dir(s) have no oracle "
                      f"entry; this dump was a FULL Verify run but the sidecar "
                      f"predates the query-name list, so staleness of those "
                      f"dirs cannot be ruled out.")
            else:
                print(f"INFO {out_dir}: {stale} result dir(s) have no oracle "
                      f"entry (rows-only queries); this dump was a FULL Verify "
                      f"run and every result dir matches a current query, so "
                      f"nothing here is stale.")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
