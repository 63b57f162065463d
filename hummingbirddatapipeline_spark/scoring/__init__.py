from hummingbirddatapipeline_spark.scoring.spec import (  # noqa: F401
    Domain,
    Indicator,
    ScoringSpec,
)
from hummingbirddatapipeline_spark.scoring.compiler import (  # noqa: F401
    apply_spec,
    spec_to_sql,
)
