"""Physical-plan audit: for each headline query, report the properties
that decide 100 TB behavior — scan pruning (ReadSchema width,
PushedFilters/PartitionFilters), join strategies (broadcast vs shuffle),
exchange count, and codegen coverage.

Usage: python tools/plan_audit.py [sf_dir] > PLAN_AUDIT.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from logistream_data_pipeline_aws_spark.session import get_spark  # noqa: E402

# every registered query; the streaming drain returns a batch memory
# table whose plan is a LocalTableScan, audited like the rest
AUDIT_QUERIES = sorted(E.queries().keys())


def audit(plan: str) -> dict[str, object]:
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        # nested loops are legitimate ONLY for by-construction-bounded
        # sides (1-row stats broadcasts, <=n_buckets offset tables,
        # flag-dim rank joins) — the column makes every one visible
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": len(scans),
        "scan_widths": [len(s.split(",")) for s in scans],
        "pushed_nonempty": sum(1 for p in pushed if p.strip()),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan-audit")
    qs = E.queries()
    print(f"# PLAN AUDIT — physical-plan properties at {sf_dir}\n")
    print("Scale invariants: dimension lookups broadcast (no fact shuffle);")
    print("scans column-pruned; filters pushed; wide codegen stages.\n")
    print("| query | broadcast | sort-merge | nested-loop (bounded) | exchanges | codegen stages | scans (cols each) | pushed filters |")
    print("|---|---|---|---|---|---|---|---|")
    for name in AUDIT_QUERIES:
        df = qs[name](spark, sf_dir)
        # execute THIS queryExecution (not a derived one) so AQE finalizes
        # and codegen stage ids (*(n)) appear in the final plan
        df._jdf.queryExecution().toRdd().count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]  # audit the final plan only
        a = audit(plan)
        print(
            f"| {name} | {a['broadcast_joins']} | {a['sortmerge_joins']} | "
            f"{a['nested_loop_joins']} | "
            f"{a['exchanges']} | {a['codegen_stages']} | "
            f"{a['scans']} ({','.join(map(str, a['scan_widths']))}) | {a['pushed_nonempty']} |"
        )


if __name__ == "__main__":
    main()
