"""Physical-plan audit over every queries() entry: materialize each
query (AQE-final plan), count hash exchanges / broadcasts / scans /
Python (ArrowEvalPython) nodes, and flag anti-patterns:

- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
- more than the expected hash exchanges for simple agg/window shapes
- row-at-a-time PythonUDF (BatchEvalPython) anywhere — Arrow only

Writes PLAN_AUDIT.md. Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from cookieblock_consent_classifier_spark.session import get_spark


def audit(plan: str) -> dict:
    return {
        "hash_exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "range_exchanges": len(re.findall(r"Exchange rangepartitioning", plan)),
        "single_exchanges": len(re.findall(r"Exchange SinglePartition", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": plan.count("FileScan") + plan.count("Scan parquet"),
        "arrow_python": plan.count("ArrowEvalPython"),
        "rowwise_python": plan.count("BatchEvalPython"),
        "cartesian": plan.count("CartesianProduct"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        "codegen": plan.count("WholeStageCodegen"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    rows = []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit(plan)
            a["name"] = name
            rows.append(a)
        except Exception as exc:  # audit must cover everything or say why
            rows.append({"name": name, "error": str(exc)[:120]})

    flagged = [
        r for r in rows
        if r.get("rowwise_python", 0) > 0 or r.get("cartesian", 0) > 0
    ]
    with open("/root/repo/PLAN_AUDIT.md", "w", encoding="utf-8") as fd:
        fd.write(
            "# PLAN_AUDIT — AQE-final physical plans of every queries() entry\n\n"
            f"sf_dir: {sf_dir}. Node counts per query; flags: row-at-a-time\n"
            "Python (must be 0 — Arrow only) and CartesianProduct (only the\n"
            "documented test-only all-pairs oracle may carry one).\n\n"
            "| query | hashEx | rangeEx | singleEx | bcast | scans | arrowPy | rowPy | cartesian | BNLJ |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            if "error" in r:
                fd.write(f"| {r['name']} | ERROR: {r['error']} |\n")
                continue
            fd.write(
                f"| {r['name']} | {r['hash_exchanges']} | {r['range_exchanges']} | "
                f"{r['single_exchanges']} | {r['broadcasts']} | {r['scans']} | "
                f"{r['arrow_python']} | {r['rowwise_python']} | {r['cartesian']} | "
                f"{r['bnl_joins']} |\n"
            )
        fd.write(
            "\nNotes:\n"
            "- rowPy must be 0 everywhere (no row-at-a-time Python UDFs).\n"
            "- embedding_near_dup is the documented TEST-ONLY exact all-pairs\n"
            "  oracle; its non-equi join is intentional (scale path:\n"
            "  lsh_near_dup_pairs).\n"
            "- singleEx on tiny final rankings (top-k limit, best-params) is\n"
            "  a deliberate k-row collapse, not a data-volume shuffle.\n"
        )
    n_err = sum("error" in r for r in rows)
    print(f"audited {len(rows)} queries, {n_err} errors, "
          f"{len(flagged)} flagged: {[r['name'] for r in flagged]}")


if __name__ == "__main__":
    main()
