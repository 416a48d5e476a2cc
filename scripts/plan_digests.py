#!/usr/bin/env python
"""Regenerate tests/plan_digests.json — the pinned physical-plan shapes
for every benched query (15 headline + 21 extended) and every
driver-gated query (GATE_PRIORITY), deduplicated (see plans/digest.py
for why).

Update procedure when a plan change is INTENTIONAL:

    python scripts/plan_digests.py --update
    git diff tests/plan_digests.json   # review: every changed count
                                       # must be explainable by your change
    git add tests/plan_digests.json && commit with the explanation

Digests are computed at the test fixture scale (sf0.001) with the test
session width (8 cores) so the pinned shapes are exactly what
tests/test_plan_digests.py rebuilds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickstreaming_end_to_end_data_engineering_project_spark.plans.digest import plan_digest
from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import all_specs
from clickstreaming_end_to_end_data_engineering_project_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "plan_digests.json")


def headline_names() -> list[str]:
    from clickstreaming_end_to_end_data_engineering_project_spark.plans.digest import (
        pinned_query_names,
    )

    return pinned_query_names()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true", help="rewrite tests/plan_digests.json")
    args = ap.parse_args()
    spark = get_spark("plan-digests", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    digests = {
        name: plan_digest(specs[name].fn(spark, SF_DIR)) for name in headline_names()
    }
    text = json.dumps(digests, indent=2, sort_keys=True) + "\n"
    if args.update:
        with open(OUT, "w") as f:
            f.write(text)
        print(f"wrote {OUT}")
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    main()
