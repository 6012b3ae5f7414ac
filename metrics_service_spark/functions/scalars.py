"""Scalar function library (SURVEY.md §2.8 F1-F22).

Every reference string/date/hash/url helper re-expressed as a built-in
Spark column expression — JVM-side, whole-stage-codegen friendly, no
Python UDFs.  Reference citations per function; the CIDR/geo-IP range
joins live in operators/iprange.py (F16/F17), robot-UA tagging in
streaming/ingest.py (F7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Public DOI syntax (Crossref guidance): directory indicator 10,
#: 4-9 digit registrant, '/', suffix.  Reference equivalent:
#: citationsmanager.py:230-239 doi_pattern regex.
DOI_PATTERN = r"(10\.\d{4,9}/[^\s\"<>]+)"


def extract_doi(col: Column) -> Column:
    """First DOI substring, '' when absent (F4; metricsdatabase.py
    :509-545 index('10.') slicing, citationsmanager.py:230-239)."""
    return F.regexp_extract(col, DOI_PATTERN, 1)


def doi_prefix(col: Column) -> Column:
    """7-char publisher prefix starting at '10.' — the reference slices
    hit[start:start+7] (metricsdatabase.py:1028-1054)."""
    start = F.instr(col, "10.")
    return F.when(start > 0, F.substring(col, start, 7)).otherwise(F.lit(""))


def strip_version_suffix(col: Column) -> Column:
    """Dryad '?ver=...' suffix strip: j.split('?')[0]
    (metricsreader.py:444-445, F3)."""
    return F.substring_index(col, "?", 1)


def month_key(ts: Column) -> Column:
    """'YYYY-MM' bucket key (strftime('%Y-%m'), metricsreader.py:347)."""
    return F.date_format(ts, "yyyy-MM")


def day_key(ts: Column) -> Column:
    return F.date_format(ts, "yyyy-MM-dd")


def year_key(ts: Column) -> Column:
    return F.date_format(ts, "yyyy")


def epoch_ms_to_ts(col: Column) -> Column:
    """ES epoch-ms bucket key -> timestamp (//1000 consumption,
    metricsreader.py:334,1051, F9)."""
    return F.timestamp_millis(col.cast("long"))


def family_hash(members: Column) -> Column:
    """MD5 over the sorted identifier family — the portal change-
    detection hash (es_eventlog_sync.py:469-482, F12/O5)."""
    return F.md5(F.concat_ws(",", F.array_sort(members)))


def geohash_prefix(col: Column, n: int) -> Column:
    """geohash_1..9 are prefix truncations (example_events.js:19-25);
    `metrics.geohash4` = 4-char prefix (00-metrics-tables.sql:28, F21)."""
    return F.substring(col, 1, n)


def parse_relative_date(s: str, *, now=None):
    """Driver-side relative-date parsing (F11): the reference's CLI
    accepts '7 days ago' / '3 hours ago' / ISO dates via the dateparser
    package (common.py:12-32, manage_es.py:59-68).  Supported here with
    stdlib only: '<n> <unit> ago' (seconds/minutes/hours/days/weeks),
    'today', 'yesterday', and ISO-8601 strings."""
    from datetime import datetime, timedelta

    now = now or datetime.utcnow()
    text = s.strip().lower()
    if text == "today":
        return now.replace(hour=0, minute=0, second=0, microsecond=0)
    if text == "yesterday":
        return now.replace(hour=0, minute=0, second=0, microsecond=0) - timedelta(
            days=1
        )
    parts = text.split()
    if len(parts) == 3 and parts[2] == "ago":
        n = float(parts[0])
        unit = parts[1].rstrip("s")
        seconds = {
            "second": 1,
            "minute": 60,
            "hour": 3600,
            "day": 86400,
            "week": 604800,
        }.get(unit)
        if seconds is None:
            raise ValueError(f"unsupported unit in {s!r}")
        return now - timedelta(seconds=n * seconds)
    return datetime.fromisoformat(s.strip())


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 9) -> Column:
    """Full geohash encode from lat/lon as PURE column expressions
    (F21: the reference stores precomputed geohash_1..9 prefixes,
    example_events.js:19-25; encoding usually reaches for a UDF — here
    the bit interleave is unrolled into shift/mask arithmetic, staying
    inside whole-stage codegen).

    Standard algorithm: quantize lon to ceil(5p/2) bits and lat to
    floor(5p/2) bits of their ranges, interleave starting with lon,
    emit 5-bit groups through the base32 alphabet."""
    total_bits = 5 * precision
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    lon_q = F.floor((lon.cast("double") + 180.0) / 360.0 * (1 << lon_bits)).cast(
        "long"
    )
    lat_q = F.floor((lat.cast("double") + 90.0) / 180.0 * (1 << lat_bits)).cast(
        "long"
    )
    # clamp the right-edge case (lat=90/lon=180 quantize to 2^bits)
    lon_q = F.least(lon_q, F.lit((1 << lon_bits) - 1))
    lat_q = F.least(lat_q, F.lit((1 << lat_bits) - 1))
    combined = F.lit(0).cast("long")
    # bit position i (0 = most significant of the interleave): even
    # positions take longitude bits, odd take latitude
    for i in range(total_bits):
        if i % 2 == 0:
            src_bit = lon_bits - 1 - (i // 2)
            bit = F.shiftright(lon_q, src_bit).bitwiseAND(F.lit(1))
        else:
            src_bit = lat_bits - 1 - (i // 2)
            bit = F.shiftright(lat_q, src_bit).bitwiseAND(F.lit(1))
        combined = combined + F.shiftleft(bit, total_bits - 1 - i)
    chars = [
        F.substring(
            F.lit(GEOHASH_BASE32),
            (
                F.shiftright(combined, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def null_country_patch(col: Column) -> Column:
    """Bucket key country None/'null' -> 'US'
    (metricsreader.py:1684-1686, P12)."""
    return F.when(col.isNull() | (col == "null"), "US").otherwise(col)


def jwt_payload(token: Column) -> Column:
    """JWT payload segment decoded to a JSON string — the logstash ruby
    filter (search.conf:208-231, F15) as unbase64 built-ins.  Pads the
    urlsafe-b64 segment; parse downstream with from_json."""
    seg = F.split(token, r"\.").getItem(1)
    # base64url -> base64, padded to a 4-multiple
    std = F.translate(seg, "-_", "+/")
    padded = F.concat(std, F.repeat(F.lit("="), (4 - F.length(std) % 4) % 4))
    return F.decode(F.unbase64(padded), "UTF-8")


def parse_doi_node(identifier: Column, node_id: Column) -> Column:
    """Per-member-node DOI normalization (es_sysmeta_sync.py:403-429
    `parseDOI`): each repository publishes identifiers in its own
    format; the result is a canonical 'doi:10....' string or NULL.

    - TDAR: 'doi:10.6067:XCV8..._meta$v=...' -> strip '_meta' suffix,
      third ':' becomes '/'.
    - DRYAD: 'http://dx.doi.org/<doi>?ver=...' -> strip query, http
      prefix becomes 'doi:'.
    - RW: bare '10.24431/...' -> prefix 'doi:'.
    - IEDA_MGDL: 'http://doi.org/<doi>' -> prefix swap.
    - default: pass through identifiers already starting with 'doi:'.
    """
    tdar_body = F.substring_index(identifier, "_meta", 1)
    tdar = F.concat(
        F.substring_index(tdar_body, ":", 2),
        F.lit("/"),
        F.substring_index(tdar_body, ":", -1),
    )
    dryad = F.regexp_replace(
        F.substring_index(identifier, "?", 1), "^http://dx\\.doi\\.org/", "doi:"
    )
    ieda = F.regexp_replace(identifier, "^http://doi\\.org/", "doi:")
    return (
        F.when(identifier.isNull(), F.lit(None).cast("string"))
        .when(
            node_id == "urn:node:TDAR",
            F.when(identifier.startswith("doi:"), tdar),
        )
        .when(node_id == "urn:node:DRYAD", dryad)
        .when(
            node_id == "urn:node:RW",
            F.when(identifier.startswith("10.24431"), F.concat(F.lit("doi:"), identifier)),
        )
        .when(node_id == "urn:node:IEDA_MGDL", ieda)
        .otherwise(F.when(identifier.startswith("doi:"), identifier))
    )


def query_params(url: Column) -> Column:
    """URL query string -> map<string,string> (logstash urldecode+kv,
    search.conf:73-88, F14)."""
    return F.str_to_map(F.parse_url(url, F.lit("QUERY")), F.lit("&"), F.lit("="))
