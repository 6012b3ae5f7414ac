"""Unit tests for the scalar function library (functions/scalars.py) —
the pieces DuckDB can't oracle-check (JWT decode, URL parsing) plus
edge cases of the DOI helpers."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F

from metrics_service_spark.functions import (
    doi_prefix,
    epoch_ms_to_ts,
    extract_doi,
    jwt_payload,
    query_params,
    strip_version_suffix,
)


def _one(spark, col, **inputs):
    df = spark.createDataFrame(
        [tuple(inputs.values())], ", ".join(f"{k} string" for k in inputs)
    )
    return df.select(col.alias("out")).first().out


def test_extract_doi_variants(spark):
    assert (
        _one(spark, extract_doi(F.col("s")), s="see doi:10.5063/F1ABC end")
        == "10.5063/F1ABC"
    )
    assert _one(spark, extract_doi(F.col("s")), s="no doi here") == ""
    # registrant must be 4-9 digits
    assert _one(spark, extract_doi(F.col("s")), s="10.12/x") == ""


def test_doi_prefix_and_version_strip(spark):
    assert _one(spark, doi_prefix(F.col("s")), s="doi:10.5063/F1") == "10.5063"
    assert _one(spark, doi_prefix(F.col("s")), s="nothing") == ""
    assert (
        _one(spark, strip_version_suffix(F.col("s")), s="pid123?ver=2018")
        == "pid123"
    )
    assert _one(spark, strip_version_suffix(F.col("s")), s="pid123") == "pid123"


def test_jwt_payload_roundtrip(spark):
    payload = {"sub": "http://orcid.org/0000-0002-1825-0097", "exp": 1234567890}
    seg = (
        base64.urlsafe_b64encode(json.dumps(payload).encode())
        .decode()
        .rstrip("=")  # JWTs strip padding
    )
    token = f"eyJhbGciOiJSUzI1NiJ9.{seg}.fakesig"
    decoded = _one(spark, jwt_payload(F.col("s")), s=token)
    assert json.loads(decoded) == payload


def test_query_params_map(spark):
    url = "https://cn.dataone.org/cn/v2/query/solr/?q=id:x&rows=25&start=0"
    m = _one(spark, query_params(F.col("s")), s=url)
    assert m["rows"] == "25" and m["q"] == "id:x" and m["start"] == "0"


def test_epoch_ms_to_ts(spark):
    df = spark.createDataFrame([(1514764800000,)], "ms long")
    out = df.select(epoch_ms_to_ts(F.col("ms")).alias("ts")).first().ts
    assert out.year == 2018 and out.month == 1 and out.day == 1


def test_parse_doi_node_rules(spark):
    from metrics_service_spark.functions import parse_doi_node

    cases = [
        # (identifier, nodeId, expected) — examples from
        # es_sysmeta_sync.py:403-429 comments
        ("doi:10.6067:XCV8TM78S9_meta$v=1319571080230", "urn:node:TDAR",
         "doi:10.6067/XCV8TM78S9"),
        ("http://dx.doi.org/10.5061/dryad.26h4q/15?ver=2017-05-17T11:39",
         "urn:node:DRYAD", "doi:10.5061/dryad.26h4q/15"),
        ("10.24431/rw1k13", "urn:node:RW", "doi:10.24431/rw1k13"),
        ("99.9/not-a-doi", "urn:node:RW", None),
        ("http://doi.org/10.1594/IEDA/312247", "urn:node:IEDA_MGDL",
         "doi:10.1594/IEDA/312247"),
        ("doi:10.5063/F1ABC", "urn:node:KNB", "doi:10.5063/F1ABC"),
        ("urn:uuid:1234", "urn:node:KNB", None),
        (None, "urn:node:KNB", None),
    ]
    df = spark.createDataFrame(
        [(i, ident, node) for i, (ident, node, _) in enumerate(cases)],
        "i int, ident string, node string",
    )
    got = {
        r.i: r.doi
        for r in df.select(
            "i", parse_doi_node(F.col("ident"), F.col("node")).alias("doi")
        ).collect()
    }
    for i, (_, _, expect) in enumerate(cases):
        assert got[i] == expect, (i, got[i], expect)


def test_geohash_encode_known_vectors(spark):
    from metrics_service_spark.functions import geohash_encode, geohash_prefix

    cases = [
        # classic test vector from the original geohash description
        (57.64911, 10.40744, "u4pruydqq"),
        (0.0, 0.0, "s00000000"),
        (90.0, 180.0, "zzzzzzzzz"),   # right edge clamps
        (-90.0, -180.0, "000000000"),
        (37.7749, -122.4194, None),   # San Francisco: checked vs pygeohash-style impl below
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo, _) in enumerate(cases)],
        "i int, lat double, lon double",
    )
    out = df.select(
        "i", geohash_encode(F.col("lat"), F.col("lon"), 9).alias("gh")
    )
    got = {r.i: r.gh for r in out.collect()}
    for i, (la, lo, expect) in enumerate(cases):
        if expect is not None:
            assert got[i] == expect, (la, lo, got[i], expect)

    # cross-check every case against a pure-python reference encoder
    def py_geohash(lat, lon, precision=9):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        bits, even, ch, out = 0, True, 0, []
        while len(out) < precision:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    ch = ch * 2 + 1
                    lon_lo = mid
                else:
                    ch = ch * 2
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    ch = ch * 2 + 1
                    lat_lo = mid
                else:
                    ch = ch * 2
                    lat_hi = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(b32[ch])
                bits, ch = 0, 0
        return "".join(out)

    for i, (la, lo, _) in enumerate(cases):
        assert got[i] == py_geohash(la, lo), (la, lo)

    # geohash4 column = prefix truncation of the full encode (F21)
    out4 = df.select("i", geohash_prefix(geohash_encode(F.col("lat"), F.col("lon"), 9), 4).alias("g4")).collect()
    for r in out4:
        assert r.g4 == got[r.i][:4]


def test_parse_relative_date():
    from datetime import datetime

    from metrics_service_spark.functions import parse_relative_date

    now = datetime(2026, 8, 13, 12, 30, 0)
    assert parse_relative_date("7 days ago", now=now) == datetime(2026, 8, 6, 12, 30)
    assert parse_relative_date("3 hours ago", now=now) == datetime(2026, 8, 13, 9, 30)
    assert parse_relative_date("1 week ago", now=now) == datetime(2026, 8, 6, 12, 30)
    assert parse_relative_date("today", now=now) == datetime(2026, 8, 13)
    assert parse_relative_date("yesterday", now=now) == datetime(2026, 8, 12)
    assert parse_relative_date("2024-02-29T10:00:00") == datetime(2024, 2, 29, 10)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_relative_date("5 fortnights ago", now=now)


def test_json_state_roundtrip(tmp_path):
    from metrics_service_spark.sources.state import JsonState

    st = JsonState(str(tmp_path / "state.json"))
    assert st.get("missing") is None
    st.set("last_harvest", "2026-08-01T00:00:00")
    st.set("counts", {"events": 123})
    assert st.get("last_harvest") == "2026-08-01T00:00:00"
    assert JsonState(str(tmp_path / "state.json")).get("counts") == {"events": 123}
    st.delete("counts")
    assert st.all() == {"last_harvest": "2026-08-01T00:00:00"}


def test_occurrences_counts_adjacent_repeats(spark):
    """Regression (ADVICE r01): pad-and-replace undercounted 'the the
    the' as 2; the token-array filter counts all 3."""
    from pyspark.sql import functions as F

    from metrics_service_spark.operators.text import occurrences

    df = spark.createDataFrame(
        [("the the the",), ("a the b the",), ("thethe the",), ("",)],
        "text string",
    )
    got = [r[0] for r in df.select(occurrences(F.col("text"), "the")).collect()]
    assert got == [3, 2, 1, 0]
