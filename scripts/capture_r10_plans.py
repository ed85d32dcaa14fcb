#!/usr/bin/env python
"""Capture the formatted physical plans a query ACTUALLY executes.

The round-10 optimization targets are lifecycle queries (write ->
ANALYZE -> pruned read -> detach) whose returned DataFrame is a detached
local relation — the interesting plans are the INTERNAL actions. This
script hooks DataFrame.collect/toPandas/count and DataFrameWriter.save
for the duration of one query call and dumps the formatted plan of every
actioned DataFrame, in execution order.

    python scripts/capture_r10_plans.py <outdir> <suffix> <query> [...]

writes <outdir>/<query>_<suffix>.txt. Run with PYTHONPATH at the
baseline commit's worktree for "_before", at HEAD for "_after".
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    from fourmc_spark.queries import QUERIES
    from fourmc_spark.session import get_spark

    spark = get_spark("capture-plans", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    captured: list[tuple[str, str]] = []

    def _explain(df) -> str:
        try:
            return df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # streaming frames have no execution yet
            return f"<no batch plan: {exc}>"

    orig = {
        "collect": DataFrame.collect,
        "toPandas": DataFrame.toPandas,
        "count": DataFrame.count,
        "save": DataFrameWriter.save,
    }

    def wrap_df(kind):
        def inner(self, *a, **kw):
            captured.append((kind, _explain(self)))
            return orig[kind](self, *a, **kw)

        return inner

    def wrap_save(self, *a, **kw):
        captured.append(("save", _explain(self._df)))
        return orig["save"](self, *a, **kw)

    for name in names:
        captured.clear()
        DataFrame.collect = wrap_df("collect")
        DataFrame.toPandas = wrap_df("toPandas")
        DataFrame.count = wrap_df("count")
        DataFrameWriter.save = wrap_save
        try:
            out = QUERIES[name](spark, SF_DIR)
            final_plan = _explain(out)
        finally:
            DataFrame.collect = orig["collect"]
            DataFrame.toPandas = orig["toPandas"]
            DataFrame.count = orig["count"]
            DataFrameWriter.save = orig["save"]
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — internal action plans in execution order "
                f"({suffix}, sf dir {SF_DIR})\n"
            )
            for i, (kind, txt) in enumerate(captured):
                f.write(f"\n## action {i}: {kind}\n\n{txt.rstrip()}\n")
            f.write(f"\n## returned frame\n\n{final_plan.rstrip()}\n")
        print(f"wrote {path} ({len(captured)} actions)")
    spark.stop()


if __name__ == "__main__":
    main()
