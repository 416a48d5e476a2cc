"""Plan-shape regression guard for every benched and driver-gated query.

Pins the counts of shape-significant physical operators (join
strategies, exchanges, aggregate tiers, top-k, windows — see
plans/digest.py) against tests/plan_digests.json.  The r8 JDK bump
proved environment changes can silently demote an execution tier;
this catches the Spark-plan analogue (a broadcast flipping to
sort-merge, a new shuffle, TakeOrdered degrading to Sort+Limit)
before the bench does.

On an INTENTIONAL plan change::

    python scripts/plan_digests.py --update

then review the tests/plan_digests.json diff — every changed count
must be explainable by your change — and commit it alongside.
"""

from __future__ import annotations

import json
import os

import pytest

from clickstreaming_end_to_end_data_engineering_project_spark.plans.digest import plan_digest
from clickstreaming_end_to_end_data_engineering_project_spark.plans.registry import all_specs

_SNAP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_digests.json")

with open(_SNAP) as f:
    SNAPSHOTS: dict[str, dict[str, int]] = json.load(f)


def _headline() -> list[str]:
    from clickstreaming_end_to_end_data_engineering_project_spark.plans.digest import (
        pinned_query_names,
    )

    return pinned_query_names()


def test_snapshot_covers_exactly_the_headline():
    assert sorted(SNAPSHOTS) == sorted(_headline()), (
        "plan_digests.json out of sync with bench lists + GATE_PRIORITY — "
        "run scripts/plan_digests.py --update"
    )


@pytest.mark.parametrize("name", sorted(SNAPSHOTS))
def test_headline_plan_shape_pinned(spark, name):
    # digests are pinned at the smoke fixture scale with the test
    # session (8 cores) — same environment scripts/plan_digests.py uses
    got = plan_digest(all_specs()[name].fn(spark, "/root/testdata/sf0.001"))
    assert got == SNAPSHOTS[name], (
        f"physical plan shape drifted for {name}:\n"
        f"  pinned : {SNAPSHOTS[name]}\n"
        f"  current: {got}\n"
        "If intentional: python scripts/plan_digests.py --update and "
        "commit the reviewed diff."
    )
