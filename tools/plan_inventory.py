"""Dump `plan_summary` (plans/lint.py) for EVERY registered and
unregistered query to one JSON file — the machine-readable form of
auditing `.explain("formatted")` across the whole surface: shuffle
and reuse counts, scans with pushed filters and read schemas,
whole-stage-codegen spans, Arrow-vs-row Python stages, join-strategy
mix, plus the lint findings (rule/severity) per query.

Use it to diff plan shape between rounds: a query whose exchange
count or join mix moves without a recorded rationale is a regression
candidate before any timing run.

Usage: python tools/plan_inventory.py [out.json]
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.01). Queries with
eager-materializing construction (barrier pipelines) run their
barrier jobs; everything else is driver-side planning only.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.json"

    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.plans.lint import (
        lint_plan,
        plan_summary,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        REGISTRY,
        UNREGISTERED,
    )

    spark = get_spark(app_name="plan-inventory")
    spark.sparkContext.setLogLevel("ERROR")
    inventory: dict[str, dict] = {}
    for coll, tier in ((REGISTRY, "registered"), (UNREGISTERED, "unregistered")):
        for name, spec in coll.items():
            try:
                df = spec.fn(spark, sf_dir)
                summary = plan_summary(df)
                findings = [
                    {"rule": f["rule"], "severity": f["severity"]}
                    for f in lint_plan(df)
                ]
            except Exception as ex:  # a broken query must not hide the rest
                inventory[name] = {"tier": tier, "error": str(ex)[:200]}
                continue
            inventory[name] = {
                "tier": tier,
                "oracle": bool(spec.oracle),
                **summary,
                "lint": findings,
            }
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "queries": inventory}, fh, indent=1,
                  sort_keys=True)
    n_reg = sum(1 for v in inventory.values() if v["tier"] == "registered")
    print(f"wrote {out_path}: {len(inventory)} queries ({n_reg} registered)")
    spark.stop()


if __name__ == "__main__":
    main()
