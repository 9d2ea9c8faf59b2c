#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped engine is pure Scala/Spark; this mirrors the driver's DuckDB
oracle so we can hash-check before committing).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table in
<sfDir> as a DuckDB view, runs each oracle, and compares against the
Spark parquet dump at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted by all columns, exact value equality (bit-exact doubles).
"""
import sys, json, glob, os, threading, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Hard wall-clock budget per oracle. One pathological oracle (e.g. a
# chained multi-referenced CTE that DuckDB re-inlines exponentially —
# the llm_bpe_learn r12 incident) must fail ITS row loudly, never hang
# the whole board into an empty CORRECTNESS json.
ORACLE_TIMEOUT_S = float(os.environ.get("ORACLE_TIMEOUT_S", "60"))


class OracleTimeout(Exception):
    pass


def run_oracle(con, sql):
    """Execute one oracle with a timeout: a timer thread calls
    con.interrupt(), which makes the in-flight execute raise; we map
    that to OracleTimeout so the caller prints a self-explaining FAIL.

    Race hardening: (a) the interrupt only fires while this oracle is
    still marked in-flight (lock-guarded), so a timer landing just as
    the query completes cannot poison the shared connection for the
    NEXT oracle; (b) OracleTimeout is only raised when the wall clock
    actually crossed the budget, so a genuine query error arriving in
    the same instant is never masked as a timeout; (c) if a stray
    interrupt still slips into the gap between execute() returning
    inside duckdb and the done-flag flip, the single retry below
    re-runs the (fast, non-timed-out) oracle instead of failing it."""
    lock = threading.Lock()
    state = {"done": False, "timed_out": False}

    def _interrupt():
        with lock:
            if state["done"]:
                return
            state["timed_out"] = True
            con.interrupt()

    for attempt in (1, 2):
        state["done"] = False
        state["timed_out"] = False
        timer = threading.Timer(ORACLE_TIMEOUT_S, _interrupt)
        timer.start()
        t0 = time.monotonic()
        try:
            result = con.execute(sql).fetchdf()
            with lock:
                state["done"] = True
            return result
        except Exception as e:
            with lock:
                state["done"] = True
            elapsed = time.monotonic() - t0
            if state["timed_out"] and elapsed >= ORACLE_TIMEOUT_S * 0.9:
                raise OracleTimeout(
                    f"oracle exceeded {ORACLE_TIMEOUT_S:.0f}s and was interrupted")
            # retry ONLY a genuine stray interrupt (a timer landing in the
            # gap after a fast oracle completed) — a plain query error
            # (syntax, missing table) must fail its row immediately, not
            # re-run a known-broken query
            is_interrupt = (isinstance(e, duckdb.InterruptException)
                            or "INTERRUPT" in str(e).upper())
            if attempt == 1 and is_interrupt and elapsed < ORACLE_TIMEOUT_S * 0.9:
                continue  # stray interrupt from the previous oracle's timer
            raise
        finally:
            timer.cancel()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that differ in representation only
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # array/list cells (numpy.ndarray from Spark parquet, python
            # list from DuckDB) are unhashable under sort_values — render
            # both as the same compact JSON string so they sort & compare
            def _canon(v):
                if v is None or isinstance(v, (str, bytes)):
                    return v
                if hasattr(v, "tolist"):
                    v = v.tolist()
                if isinstance(v, (list, tuple)):
                    return json.dumps(v, separators=(",", ":"))
                return str(v)
            df[c] = df[c].apply(_canon)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True))
            want = norm(run_oracle(con, sql))
        except OracleTimeout as e:
            print(f"FAIL {name}: ORACLE-TIMEOUT: {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
                # the driver hashes value REPRS, so int64 17 vs float64 17.0
                # (e.g. an uncast DuckDB HUGEINT sum) mismatches there even
                # though the values compare equal above — fail locally on any
                # cross-kind dtype pair (int width differences are tolerated)
                kinds = {"i": "i", "u": "i", "f": "f", "M": "M", "O": "O", "b": "b"}
                bad_kind = [c for c in got.columns
                            if kinds.get(got[c].dtype.kind) != kinds.get(want[c].dtype.kind)]
                if bad_kind:
                    raise AssertionError(
                        "dtype-kind mismatch (driver repr hash would differ): "
                        + ", ".join(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}"
                                    for c in bad_kind))
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            except AssertionError as e:
                first = str(e).strip().splitlines()
                print(f"FAIL {name}: {first[0] if first else e}")
                for ln in first[1:6]:
                    print(f"     {ln}")
                n_fail += 1
    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracles:
            continue
        files = glob.glob(f"{d}/*.parquet")
        rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'PASS' if rows > 0 else 'FAIL'} {name} (rows-only: {rows})")
        if rows > 0:
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
