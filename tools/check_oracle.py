"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column-name
schema, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

REPO = "/root/repo"
sys.path.insert(0, REPO)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except TypeError:
                pass
            df[col] = s.astype("datetime64[us]")
        # NO list/array special-casing: the driver's canonicalizer
        # crashes on unhashable array cells, so a gate row emitting a
        # raw array column must FAIL here too (serialize arrays as a
        # joined string + length — the lifecycle_array_trend rule).
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.10g").encode()
    return hashlib.md5(body).hexdigest()


def dtype_kind_mismatch(s: pd.DataFrame, d: pd.DataFrame) -> list[str]:
    """Columns whose pandas dtype KIND differs between the Spark and
    DuckDB frames (int vs float vs object ...).  The local
    ``%.10g``-formatted hash renders ``301.0`` and ``301``
    identically, so a kind divergence can be green here yet red under
    the driver's canonicalizer — the r11 ``token_budget_select``
    failure class (DuckDB HUGEINT window sum -> float64).  Treat any
    hit as a cross-environment reproducibility bug."""
    out = []
    for c in s.columns:
        ks, kd = s[c].dtype.kind, d[c].dtype.kind
        if ks == kd:
            continue
        # int-vs-object(int) is rendered identically by to_csv; only
        # flag when a FLOAT faces a non-float (the lossy rendering).
        if "f" in (ks, kd):
            out.append(f"{c}({ks} vs {kd})")
    return out


def dump_mismatch(name: str, s: pd.DataFrame, d: pd.DataFrame) -> str:
    """On a hash mismatch, persist both normalized frames and their
    row-level diff so a divergence seen only in another environment
    (e.g. the driver's) is diagnosable from artifacts alone."""
    import os

    outdir = f"/tmp/oracle_diff/{name}"
    os.makedirs(outdir, exist_ok=True)
    s.to_csv(f"{outdir}/spark.csv", index=False)
    d.to_csv(f"{outdir}/duck.csv", index=False)
    with open(f"{outdir}/diff.txt", "w") as fh:
        fh.write(f"dtypes spark: {dict(s.dtypes.astype(str))}\n")
        fh.write(f"dtypes duck:  {dict(d.dtypes.astype(str))}\n")
        if len(s) == len(d):
            for c in s.columns:
                neq = ~(
                    (s[c] == d[c])
                    | (s[c].isna() & d[c].isna())
                )
                if neq.any():
                    idx = neq[neq].index
                    fh.write(f"column {c}: {len(idx)} differing rows\n")
                    for i in idx[:20]:
                        fh.write(
                            f"  [{i}] spark={s[c][i]!r} duck={d[c][i]!r}\n"
                        )
        else:
            fh.write(f"row counts differ: {len(s)} vs {len(d)}\n")
    return outdir


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from minerva_etl_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(sdf)} ({t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        try:
            s, d = normalize(sdf), normalize(ddf)
        except TypeError as e:
            # the driver's canonicalizer dies the same way on raw
            # array cells — record the row RED, keep sweeping
            print(f"FAIL {name}: canonicalize error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(s) != len(d):
            problems.append(f"rows {len(s)} vs {len(d)}")
        if list(s.columns) != list(d.columns):
            problems.append(f"cols {list(s.columns)} vs {list(d.columns)}")
        if not problems:
            kinds = dtype_kind_mismatch(s, d)
            if kinds:
                # green under %.10g but red under a verbatim-float
                # canonicalizer — fail it HERE so the divergence never
                # ships to the driver
                problems.append(f"dtype-kind mismatch {kinds}")
                dumped = dump_mismatch(name, s, d)
                print(f"    dumped frames to {dumped}")
        if not problems and value_hash(s) != value_hash(d):
            diff_cols = []
            for c in s.columns:
                if not s[c].equals(d[c]):
                    diff_cols.append(c)
            problems.append(f"hash mismatch in cols {diff_cols}")
            dumped = dump_mismatch(name, s, d)
            print(f"    dumped frames to {dumped}")
            for c in diff_cols[:2]:
                neq = s[c] != d[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"    {name}.{c}[{i}]: spark={s[c][i]!r} duck={d[c][i]!r}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} "
                  f"(spark {t_spark:.1f}s duck {t_duck:.1f}s)")
            failures.append(name)
        else:
            print(f"OK   {name}: rows={len(s)} "
                  f"(spark {t_spark:.1f}s duck {t_duck:.1f}s)")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
