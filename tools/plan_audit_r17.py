"""Full-registry plan audit (r17): for every declared query, capture
the formatted physical plan and flag structural smells:

- BatchEvalPython / ArrowEvalPython nodes (row-at-a-time Python);
- CartesianProduct / BroadcastNestedLoopJoin (excluding one-row
  broadcast folds is the reviewer's job — counts are printed);
- DUPLICATED SCAN SUBTREES: the same parquet location scanned more
  times than once in one plan — the shared-subtree re-execution smell
  the r16 checkpoint batches fixed where found (a scan appearing 2×
  can be legitimate, e.g. a self-join; >2× usually is not);
- Exchange count (ReusedExchange excluded).

Usage: python tools/plan_audit_r17.py [sf_dir]   (default sf0.001)
Prints one JSON line per query, then a summary of the worst rows.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry_mod
    from minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="plan_audit_r17")
    qs = entry_mod.queries()
    rows = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            formatted = df._jdf.queryExecution().explainString(mode)
        except Exception as e:
            print(json.dumps({"query": name, "err": str(e)[:120]}),
                  flush=True)
            continue
        scans = re.findall(r"Location: [^\[]*\[([^\]]+)\]", formatted)
        from collections import Counter

        scan_counts = Counter(s.split("/")[-1] for s in scans)
        dup_scans = {k: v for k, v in scan_counts.items() if v > 2}
        rec = {
            "query": name,
            "exchanges": sum(
                1 for ln in formatted.splitlines()
                if re.search(r"\bExchange\b", ln)
                and "ReusedExchange" not in ln
            ),
            "py_nodes": sum(
                formatted.count(n)
                for n in ("BatchEvalPython", "ArrowEvalPython")
            ),
            "cartesian": formatted.count("CartesianProduct")
            + formatted.count("BroadcastNestedLoopJoin"),
            "dup_scans": dup_scans,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    worst = sorted(
        (r for r in rows if r.get("dup_scans")),
        key=lambda r: -max(r["dup_scans"].values()),
    )
    print("\n== duplicated-scan rows ==")
    for r in worst:
        print(r["query"], r["dup_scans"])
    print("\n== python-node rows ==")
    for r in rows:
        if r["py_nodes"]:
            print(r["query"], r["py_nodes"])


if __name__ == "__main__":
    main()
