"""Explicit StructType schemas for the reference's data model
(SURVEY.md §1.2-1.3, FIXTURES.md) — the silver-layer contracts.

The event table is the 100 TB fact stream; at scale it is written as
Parquet partitioned by `event_date` (so every query's date-range filter
prunes partitions) and the array/struct columns keep their nested
encodings columnar.
"""

from __future__ import annotations

from pyspark.sql import types as T

GEOIP = T.StructType(
    [
        T.StructField("country_code2", T.StringType()),
        T.StructField("city_name", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("eventId", T.StringType(), False),
        T.StructField("entryId", T.StringType()),
        T.StructField("nodeId", T.StringType()),
        T.StructField("pid", T.StringType()),
        T.StructField("formatType", T.StringType()),
        T.StructField("formatId", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("dateLogged", T.TimestampType()),
        T.StructField("dateAggregated", T.TimestampType()),
        T.StructField("ipAddress", T.StringType()),
        T.StructField("userAgent", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("isPublic", T.BooleanType()),
        T.StructField("sessionId", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("geoip", GEOIP),
        T.StructField("portalIdentifier", T.ArrayType(T.StringType())),
        T.StructField("searchevent", T.BooleanType()),
    ]
)

IDENTIFIER_SCHEMA = T.StructType(
    [
        T.StructField("PID", T.StringType(), False),
        T.StructField("SID", T.StringType()),
        T.StructField("DOIs", T.ArrayType(T.StringType())),
        T.StructField("isPublic", T.BooleanType()),
        T.StructField("formatType", T.StringType()),
        T.StructField("userID", T.ArrayType(T.StringType())),
        T.StructField("datasetIdentifierFamily", T.ArrayType(T.StringType())),
    ]
)

CITATION_SCHEMA = T.StructType(
    [
        T.StructField("target_id", T.StringType(), False),
        T.StructField("source_id", T.StringType(), False),
        T.StructField("source_url", T.StringType()),
        T.StructField("link_publication_date", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("publisher", T.StringType()),
        T.StructField("journal", T.StringType()),
        T.StructField("year_of_publishing", T.IntegerType()),
        T.StructField("relation_type", T.StringType()),
    ]
)

IDENTIFIER_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("seriesId", T.StringType()),
        T.StructField("documents", T.ArrayType(T.StringType())),
        T.StructField("resourceMap", T.ArrayType(T.StringType())),
        T.StructField("obsoletes", T.StringType()),
    ]
)
