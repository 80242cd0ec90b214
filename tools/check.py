#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [--run] [--only=q91,q95]

--only (with --run) dumps and checks just the queries whose names
contain any given substring — the fast iteration path when working on
one operator. The driver always runs the full set.

Assumes `sbt compile` (or package) already ran and Verify was executed to
produce outDir/<name>/ parquet dirs + outDir/oracle_sql.json, OR run with
--run to invoke Verify first via java.

Compares each query result against the DuckDB oracle:
  - schema: column names (sorted) must match
  - values: exact equality after sorting columns by name (and rows,
    to be robust to row-order differences)

Float columns are compared by canonical string render (repr), matching
the driver's hash semantics: -0.0 != 0.0, NaN payloads unified. The
round-7 q192 failure was invisible to a plain pandas `==` compare
because IEEE says -0.0 == 0.0; the driver's hash disagreed.
Run `python3 tools/check.py --selftest` to prove this gate catches it.
"""
import json
import os
import subprocess
import sys
import glob

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify(sf_dir, out_dir):
    jars = sorted(glob.glob("/opt/spark/jars/*.jar"))
    cp = "target/scala-2.13/classes:" + ":".join(jars)
    opens = [
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
    ]
    cmd = ["java"]
    for p in opens:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-Xmx8g",
        "-cp", cp, "graft.Verify", sf_dir, out_dir,
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    only = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")]
    if only:
        env["SPARK_GRAFT_ONLY"] = only[0]
    r = subprocess.run(cmd, cwd="/root/repo", env=env)
    if r.returncode != 0:
        print("Verify FAILED", file=sys.stderr)
        sys.exit(1)


def compare_frames(m, r):
    """Value compare at the driver's hash strictness. Assumes columns
    already sorted/aligned and row counts equal."""
    # normalize dtypes for compare: ints → Int64, timestamps → us,
    # floats → canonical repr strings (bitwise-strict on signed zero,
    # NaN-payload tolerant), objects → str
    def norm(df):
        df = df.copy()
        for c in df.columns:
            dt = str(df[c].dtype)
            if dt.startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            elif dt.startswith(("int", "uint", "Int", "UInt")):
                df[c] = df[c].astype("Int64")
            elif dt.startswith(("float", "Float")):
                df[c] = df[c].astype("float64").map(repr)
            elif df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    m, r = norm(m), norm(r)
    if m.equals(r):
        return f"OK ({len(m)} rows)"
    diffs = []
    for c in m.columns:
        if not m[c].equals(r[c]):
            neq = (m[c] != r[c]) & ~(m[c].isna() & r[c].isna())
            idx = neq[neq].index[:3]
            for i in idx:
                diffs.append(f"{c}[{i}]: mine={m[c][i]!r} ref={r[c][i]!r}")
    return "VALUE-MISMATCH " + "; ".join(diffs[:6])


def selftest():
    """Prove the gate catches the divergence classes the driver's hash
    sees but a plain pandas == compare does not."""
    base = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    negz = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    assert compare_frames(base, base).startswith("OK"), "identical frames must pass"
    res = compare_frames(base, negz)
    assert res.startswith("VALUE-MISMATCH"), f"-0.0 vs 0.0 must FAIL, got: {res}"
    nan1 = pd.DataFrame({"v": [float("nan")]})
    assert compare_frames(nan1, nan1.copy()).startswith("OK"), "NaN == NaN must pass"
    close = pd.DataFrame({"v": [0.1 + 0.2]})
    exact = pd.DataFrame({"v": [0.3]})
    assert compare_frames(close, exact).startswith("VALUE-MISMATCH"), "1-ulp must FAIL"
    print("selftest OK: -0.0 != 0.0 caught, NaN==NaN passes, 1-ulp caught")


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--run" in sys.argv:
        # wipe stale output: leftovers from a previous run must not be
        # compared as if they were produced by this build
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        run_verify(sf_dir, out_dir)

    if "--exec-only" in sys.argv:
        # The q186 lesson (round 10): the sf0.01/sf0.001 oracle gates
        # verify ANSWERS but never grow intermediates to 10x scale, and
        # the bench executes at 10x but checks nothing — so a
        # scale-dependent crash (ANSI overflow) hides until the two
        # paths happen to intersect. This mode is the cheap third gate:
        # run every query at sf0.1, no DuckDB compare, FAIL on any
        # crash (MISSING) or unreadable dump. Empty results are counted
        # and printed as warnings, NOT failures: thresholded queries
        # (near-dup pairs, graph motifs, >3sigma spikes) can be
        # legitimately empty at a different SF — the round-11 sweep's
        # 10 empties were all confirmed empty by their DuckDB oracles
        # at sf0.1. A NEW empty vs the previous round's sweep is worth
        # a manual oracle check. Checklist:
        #   python3 tools/check.py /root/testdata/sf0.1 /tmp/exec_sf01 --run --exec-only
        results = {}
        # a vanished out_dir or absent manifest means Verify never got
        # far enough to attempt anything — that must read as a loud
        # failure, never as a "0/0 execute" pass (advisor r11 finding)
        if not os.path.isdir(out_dir):
            print(f"FAIL: out_dir {out_dir} does not exist — Verify never ran",
                  file=sys.stderr)
            sys.exit(2)
        names = sorted(d for d in os.listdir(out_dir)
                       if os.path.isdir(f"{out_dir}/{d}"))
        manifest_path = f"{out_dir}/queries.json"
        if not os.path.exists(manifest_path):
            print(f"FAIL: {manifest_path} missing — Verify crashed before "
                  "writing its manifest; nothing is gradeable", file=sys.stderr)
            sys.exit(2)
        with open(manifest_path) as f:
            for expected in json.load(f):
                if expected not in names:
                    results[expected] = "MISSING (query crashed in Verify — see stderr)"
        if not results and not names:
            print("FAIL: manifest lists zero queries and no query dirs exist",
                  file=sys.stderr)
            sys.exit(2)
        for name in names:
            try:
                n = len(pd.read_parquet(f"{out_dir}/{name}"))
            except Exception as e:
                results[name] = f"READ-FAIL {e}"
                continue
            results[name] = f"OK ({n} rows)" if n > 0 else "EMPTY (0 rows — check the oracle)"
        n_bad = sum(1 for v in results.values()
                    if v.startswith(("MISSING", "READ-FAIL")))
        n_empty = sum(1 for v in results.values() if v.startswith("EMPTY"))
        for k, v in sorted(results.items()):
            flag = "✓" if v.startswith("OK") else ("∅" if v.startswith("EMPTY") else "✗")
            print(f"{flag} {k}: {v}")
        print(f"\n{len(results) - n_bad}/{len(results)} execute"
              f" ({n_empty} empty — verify any NEW ones against their oracle)")
        sys.exit(0 if n_bad == 0 else 2)

    con = duckdb.connect()
    # keep DuckDB spill files out of the repo (committed .tmp blobs once
    # bloated git history to ~600MB packed)
    con.execute("SET temp_directory='/tmp/duckdb_tmp'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    # a registered query that crashed writes no dir — that's a failure,
    # not a smaller denominator
    manifest_path = f"{out_dir}/queries.json"
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for expected in json.load(f):
                if expected not in names:
                    results[expected] = "MISSING (query crashed in Verify — see stderr)"
    for name in names:
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracles:
            # every registered rows-only query is expected to produce rows
            # at all SFs; an empty result is a regression, not a pass
            if len(mine) == 0:
                results[name] = "ROWS-ONLY-EMPTY (0 rows — regression)"
            else:
                results[name] = f"rows-only ({len(mine)} rows)"
            continue
        try:
            ref = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        m = mine.reindex(sorted(mine.columns), axis=1)
        r = ref.reindex(sorted(ref.columns), axis=1)
        if list(m.columns) != list(r.columns):
            results[name] = f"SCHEMA-MISMATCH mine={list(m.columns)} ref={list(r.columns)}"
            continue
        if len(m) != len(r):
            results[name] = f"ROWCOUNT mine={len(m)} ref={len(r)}"
            continue
        results[name] = compare_frames(m, r)

    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for k, v in sorted(results.items()):
        flag = "✓" if v.startswith(("OK", "rows-only")) else "✗"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 2)


if __name__ == "__main__":
    main()
