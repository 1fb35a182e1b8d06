"""Dump .explain("formatted") for named queries to plans/r06/<q>_<tag>.txt
(the optimization-round evidence files the judge reads).

Usage: python tools/dump_plans_r06.py <before|after> q1 [q2 ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from api_ocr_spark.plans.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans-r06-{tag}", cores=8)
    qs = entrymod.queries()
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython')} BatchEvalPython, "
              f"{plan.count('ArrowEvalPython') + plan.count('MapInArrow') + plan.count('PythonMapInArrow')} arrow-py, "
              f"{plan.count('CartesianProduct')} cartesian")
    spark.stop()


if __name__ == "__main__":
    main()
