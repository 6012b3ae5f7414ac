"""Engine session configuration guards: the scale-relevant settings
must survive refactors (SCALE.md documents why each matters)."""

from __future__ import annotations


def test_engine_confs(spark):
    # the shared test session is built by session.get_spark
    from metrics_service_spark.session import get_spark

    s = get_spark("conf-guard")
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"
    assert s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    # broadcast threshold raised so every dim in SCALE.md broadcasts
    assert int(s.conf.get("spark.sql.autoBroadcastJoinThreshold")) >= 64 * 1024 * 1024
