#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already dumped
one parquet dir per query plus oracle_sql.json. Runs each oracle in
DuckDB over views named after the tables, then compares: schema (column
names + dtypes after name-sort), row count, and values (exact for
non-floats; tiny-tolerance report for floats so we can see whether a
mismatch is real or an ulp).
"""
import json
import sys
import glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def array_columns(df: pd.DataFrame):
    return [c for c in df.columns
            if df[c].dtype == object and len(df)
            and isinstance(df[c].iloc[0], (list, np.ndarray))]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # timestamps: compare at microsecond precision, tz-naive
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    problems = []
    # DRIVER PARITY (round-7 lesson): the driver's pandas harness
    # crashes sorting/hashing array cells (TypeError: unhashable type
    # numpy.ndarray) and records the query as an ERROR. The old local
    # gate tuple-ized arrays and reported green, diverging from the
    # driver. An array output column is therefore a hard FAIL here:
    # fingerprint it (md5 of the comma-joined elements) on both
    # engines instead — see mm_embed / emb_normalize / vocab_encode.
    arr = sorted(set(array_columns(spark_df)) | set(array_columns(oracle_df)))
    if arr:
        return [f"ARRAY[{c}]: raw array output crashes the driver's "
                f"harness — fingerprint it on both engines" for c in arr]
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rowcount: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        da, db_ = str(a[c].dtype), str(b[c].dtype)
        if da != db_:
            problems.append(f"dtype[{c}]: spark={da} oracle={db_}")
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f":
            both_nan = av.isna() & bv.isna()
            null_mismatch = av.isna() != bv.isna()
            if int(null_mismatch.sum()):
                idx = null_mismatch.idxmax()
                problems.append(
                    f"NULL[{c}]: {int(null_mismatch.sum())} rows have NULL on "
                    f"one side only (e.g. row {idx}: {av[idx]!r} vs {bv[idx]!r})")
                continue
            eq = np.isclose(av.fillna(0), bv.fillna(0), rtol=0, atol=0) | both_nan
            exact_bad = int((~eq).sum())
            close = np.isclose(av.fillna(0), bv.fillna(0), rtol=1e-9, atol=1e-9) | both_nan
            close_bad = int((~close).sum())
            if exact_bad:
                tag = "FLOAT-EXACT" if close_bad == 0 else "FLOAT-REAL"
                idx = (~eq).idxmax()
                problems.append(
                    f"{tag}[{c}]: {exact_bad} rows differ exactly, {close_bad} beyond 1e-9 "
                    f"(e.g. row {idx}: {av[idx]!r} vs {bv[idx]!r})")
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if int(neq.sum()):
                idx = neq.idxmax()
                problems.append(
                    f"VAL[{c}]: {int(neq.sum())} rows differ "
                    f"(e.g. row {idx}: {av[idx]!r} vs {bv[idx]!r})")
    return problems


def main():
    # positional: sfDir outDir; flags: --only=a,b  --skip=a,b
    # --timeout=SECS (per-oracle watchdog via duckdb interrupt —
    # a timed-out oracle reports [SLOW] and the run continues; used
    # by the sf1 gate where a handful of dedup oracles are
    # DuckDB-quadratic and get dedicated passes)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    # bare `--fork` counts as `--fork=1` — the "=" -only parse
    # silently ignored bare flags, and an un-forked sf1 gate died on
    # the first allocator-poisoning OOM (round-13 lesson). Only `fork`
    # may appear bare: a bare value-requiring flag (e.g. a typo'd
    # `--only` with no "=") would otherwise select zero queries and
    # let the gate pass vacuously (round-13 advice).
    BARE_OK = {"fork"}
    flags = {}
    for a in sys.argv[1:]:
        if not a.startswith("--"):
            continue
        k, eq, v = a[2:].partition("=")
        if not eq and k not in BARE_OK:
            sys.exit(f"flag --{k} requires a value (--{k}=...); "
                     f"only {sorted(BARE_OK)} may appear bare")
        flags[k] = v if eq else "1"
    only = set(flags["only"].split(",")) if "only" in flags else None
    skip = set(flags["skip"].split(",")) if "skip" in flags else set()
    timeout = float(flags["timeout"]) if "timeout" in flags else None
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    import os

    def connect():
        c = duckdb.connect()
        # out-of-core: an in-memory duckdb has NO temp_directory, so a
        # bigger-than-memory oracle OOMs instead of spilling; give it
        # one, plus a cap so one oracle can't take the whole box
        c.sql("SET temp_directory='/tmp/duck_spill'")
        c.sql(f"SET memory_limit='{flags.get('mem', '48GB')}'")
        if "threads" in flags:
            # cap a long-grinding oracle (dedup_clusters' recursive
            # closure) so it can share the box with timing work
            c.sql(f"SET threads={int(flags['threads'])}")
        for t in TABLES:
            # driver testdata is one file per table; Sf1Probe writes
            # Spark-style directories — glob those
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    # --fork: one subprocess per oracle — an interrupted or OOM-killed
    # heavy oracle can poison duckdb's process-wide allocator (seen on
    # the sf1 gate: after two interrupts even a FRESH connection OOMs
    # on CREATE VIEW), so full process isolation is the only reliable
    # containment. The child is this same script with --only=<name>.
    if "fork" in flags:
        import subprocess
        manifest_path = f"{out_dir}/queries.json"
        expected = sorted(
            set(json.load(open(manifest_path)))
            if os.path.exists(manifest_path)
            else set(json.load(open(f"{out_dir}/oracle_sql.json"))))
        if only is not None:
            expected = [n for n in expected if n in only]
        expected = [n for n in expected if n not in skip]
        if not expected:
            sys.exit("selection matched zero queries — check --only/--skip")
        n_pass = n_fail = n_slow = 0
        for name in expected:
            cmd = [sys.executable, __file__, sf_dir, out_dir,
                   f"--only={name}"]
            if timeout:
                cmd.append(f"--timeout={timeout}")
            if "mem" in flags:
                cmd.append(f"--mem={flags['mem']}")
            if "threads" in flags:
                cmd.append(f"--threads={flags['threads']}")
            try:
                r = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=(timeout * 1.5 + 300) if timeout else None)
                out = r.stdout
            except subprocess.TimeoutExpired as e:
                out = (e.stdout or "") + f"[SLOW] {name}: child killed\n"
            for line in out.splitlines():
                if line.startswith(("[ ok ]", "[FAIL]", "[rows]",
                                    "[SLOW]", "       ")):
                    print(line, flush=True)
                    if line.startswith(("[ ok ]", "[rows]")):
                        n_pass += 1
                    elif line.startswith("[FAIL]"):
                        n_fail += 1
                    elif line.startswith("[SLOW]"):
                        n_slow += 1
        slow = f", {n_slow} slow" if n_slow else ""
        print(f"\n{n_pass} ok, {n_fail} fail{slow}")
        sys.exit(1 if n_fail else 0)

    con = connect()
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    result_dirs = {p.split("/")[-1]: p for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")}
    n_pass = n_fail = n_slow = 0
    import threading
    import time as _time
    for name in sorted(result_dirs):
        if (only is not None and name not in only) or name in skip:
            continue
        files = glob.glob(f"{result_dirs[name]}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output parquet")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"[rows] {name}: {len(spark_df)} rows (no oracle — rows-only)")
            n_pass += 1
            continue
        t0 = _time.time()
        timed_out = [False]
        watchdog = None
        if timeout:
            def interrupt():
                timed_out[0] = True
                con.interrupt()
            watchdog = threading.Timer(timeout, interrupt)
            watchdog.start()
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            if watchdog:
                watchdog.cancel()
            if timed_out[0]:
                print(f"[SLOW] {name}: oracle exceeded {timeout:.0f}s "
                      f"— rerun individually with a higher --timeout",
                      flush=True)
                n_slow += 1
            else:
                print(f"[FAIL] {name}: oracle SQL error: {e}", flush=True)
                n_fail += 1
            # an interrupted (or OOM-killed) query can leave the
            # connection's allocator poisoned — every later query then
            # fails with bogus tiny-block OOMs. Reconnect fresh.
            try:
                con.close()
            except Exception:
                pass
            con = connect()
            continue
        finally:
            if watchdog:
                watchdog.cancel()
        oracle_sec = _time.time() - t0
        problems = compare(name, spark_df, oracle_df)
        if problems:
            print(f"[FAIL] {name}:", flush=True)
            for p in problems:
                print(f"       {p}")
            n_fail += 1
        else:
            print(f"[ ok ] {name}: {len(spark_df)} rows "
                  f"(oracle {oracle_sec:.1f}s)", flush=True)
            n_pass += 1
    # a crashed query writes no output dir; check against the full
    # manifest (rows-only queries included), not just oracle keys
    import os
    manifest_path = f"{out_dir}/queries.json"
    expected = set(json.load(open(manifest_path))) \
        if os.path.exists(manifest_path) else set(oracles)
    if only is not None:
        expected &= only
    expected -= skip
    missing = expected - set(result_dirs)
    for name in sorted(missing):
        print(f"[FAIL] {name}: query produced no spark output (crashed?)")
        n_fail += 1
    slow = f", {n_slow} slow" if n_slow else ""
    print(f"\n{n_pass} ok, {n_fail} fail{slow}")
    if n_pass + n_fail + n_slow == 0:
        sys.exit("selection matched zero queries — check --only/--skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
