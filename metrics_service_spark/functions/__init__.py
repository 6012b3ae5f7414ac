from metrics_service_spark.functions.scalars import (  # noqa: F401
    day_key,
    doi_prefix,
    epoch_ms_to_ts,
    extract_doi,
    family_hash,
    geohash_prefix,
    jwt_payload,
    month_key,
    null_country_patch,
    query_params,
    strip_version_suffix,
    year_key,
)
