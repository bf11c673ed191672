"""Capture .explain("formatted") for every declared query into
plans/<round>/<query>_<tag>.txt — the judge-facing plan evidence for the
optimization rounds (guide §1: measure first; §7.2: read the plan).

Usage: python tools/capture_plans.py <tag> [query ...]
  tag    "before" / "after" (file suffix)
  query  optional subset; default = all 50 declared queries
Round dir from $SPARK_GRAFT_PLAN_ROUND (default r17).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zombi_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    import __spark_entry__ as m

    qs = m.queries()
    for name in names or sorted(qs):
        df = qs[name](spark, sf_dir)
        # _explainString mirrors df.explain("formatted") but returns text
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"{name}: {len(txt)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
