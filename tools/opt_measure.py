"""Optimization-round measurement harness (guide §1): time named queries
with the noop sink in a fresh session and capture .explain("formatted").

Usage:
  python tools/opt_measure.py <out_suffix> <query> [query...]

For each query: one untimed warm-up run (codegen + session staging),
then best-of-3 timed noop writes, plus the formatted plan written to
plans/r14/<query>_<out_suffix>.txt.  Honors bench.py LINE_CONFS (the
per-line production conf overrides, e.g. AQE off for the triangle
census) so numbers are comparable with the official bench artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
import bench  # noqa: E402
from logistream_data_pipeline_aws_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("OPT_MEASURE_RUNS", "3"))
    spark = get_spark("opt-measure")
    qs = {**E.queries(), **bench.EXTRA_BENCH}
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("OPT_MEASURE_ROUND", "r15"),
    )
    os.makedirs(plans_dir, exist_ok=True)
    out: dict[str, object] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        with bench._line_confs(spark, name):
            df = qs[name](spark, sf_dir)
            # formatted plan (pre-execution: shows the static strategy)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            bench.run_query(df)  # warm-up, untimed
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                bench.run_query(qs[name](spark, sf_dir))
                runs.append(round(time.time() - t0, 3))
            # final (AQE-finalized) plan after execution
            final = (
                df._jdf.queryExecution().executedPlan().toString()
            )
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"# {name} @ {sf_dir} runs={runs} best={min(runs)}\n")
            fh.write("== explain(formatted), pre-execution ==\n")
            fh.write(plan)
            fh.write("\n== executedPlan after warm-up run ==\n")
            fh.write(final)
        out[name] = {"runs": runs, "best": min(runs)}
        print(f"[opt] {name}: {runs} best={min(runs)}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
