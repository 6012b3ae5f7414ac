"""View-routing dispatch tests (plans/gold.py)."""

from __future__ import annotations

import pytest

from metrics_service_spark.plans.gold import MATVIEWS, route_view


def test_route_picks_smallest_covering_view():
    assert route_view({"dataset_id"}, want_time=True) == "landingpage"
    assert route_view({"repository", "metrics_name"}, want_time=True) == "repocharts"
    assert (
        route_view({"user_id", "dataset_id"}, want_time=False)
        == "userprofilemetrics"
    )
    assert route_view({"award_number"}, want_time=False) == "awardcharts"


def test_route_rejects_uncoverable():
    with pytest.raises(KeyError):
        route_view({"country_code"}, want_time=True)


def test_registry_matches_reference_view_count():
    # 7 mat-views in src/sql/02-metrics-materialized-views.sql
    assert len(MATVIEWS) == 7
    rollups = [n for n, (_, r) in MATVIEWS.items() if r]
    assert sorted(rollups) == [
        "awardcharts",
        "landingpage",
        "repocharts",
        "userprofilecharts",
    ]
