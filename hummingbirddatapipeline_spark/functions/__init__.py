from hummingbirddatapipeline_spark.functions.scalar import (  # noqa: F401
    bucket,
    clamp_min,
    coalesce_chain,
    flag_parse,
    hhi,
    linear_interp_score,
    normalize_key,
    normalize_name,
    ratio_to_cap,
    safe_divide,
    year_from_yyyymm,
)
