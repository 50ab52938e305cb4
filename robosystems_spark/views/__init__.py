"""Analytics views: trial balance, fact query, element mapping, fact grid."""

from robosystems_spark.views.trial_balance import trial_balance  # noqa: F401
from robosystems_spark.views.fact_query import fact_query  # noqa: F401
from robosystems_spark.views.element_mapping import (  # noqa: F401
    ElementAssociation,
    MappingStructure,
    apply_element_mapping,
)
from robosystems_spark.views.fact_grid import build_fact_grid  # noqa: F401
