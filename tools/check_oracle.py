"""Local replica of the driver's correctness gate: run every
queries() entry via Spark AND its oracle_sql() via DuckDB at a given
sf dir; compare row count, schema width, and an order-insensitive
value hash (columns sorted by name, rows sorted, values normalized).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            v = 0.0  # -0.0 and 0.0 hash identically (engines differ on zero sign)
        return f"{v:.10g}"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import __spark_entry__ as E
    from schema_drift_detector_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok   {name:32s} rows={len(rows):6d} cols={len(cols)} [rows-only] {el:.1f}s")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            otypes = [str(t).upper() for t in res.types]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        problems = []
        # The driver hashes DuckDB results via Arrow, where HUGEINT (int128)
        # and DECIMAL render differently from int64 — str() here masks that.
        # Enforce the invariant: oracle SQL must CAST sums to BIGINT/DOUBLE.
        bad_types = [
            f"{c}:{t}" for c, t in zip(ocols, otypes)
            if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
        ]
        if bad_types:
            problems.append(f"un-cast oracle types (driver-hash hazard): {bad_types}")
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} duck={len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols spark={sorted(cols)} duck={sorted(ocols)}")
        elif value_hash(cols, rows) != value_hash(ocols, orows):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name:32s} {'; '.join(problems)}")
            failures.append(name)
            if "value-hash mismatch" in problems and len(rows) == len(orows):
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s_lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
                d_lines = sorted("\x1f".join(_norm(r[i]) for i in oorder) for r in orows)
                shown = 0
                for a, b in zip(s_lines, d_lines):
                    if a != b and shown < 3:
                        print(f"   spark: {a[:200]}")
                        print(f"   duck : {b[:200]}")
                        shown += 1
        else:
            print(f"ok   {name:32s} rows={len(rows):6d} cols={len(cols)} hash-match {el:.1f}s")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    raise SystemExit(main(sf, only))
