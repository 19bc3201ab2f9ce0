"""Column-expression builders (Catalyst expression trees)."""

from rdsa_utils_spark.functions.averages import (  # noqa: F401
    get_weight_shares,
    unweighted_arithmetic_average,
    unweighted_geometric_average,
    weighted_arithmetic_average,
    weighted_geometric_average,
)
from rdsa_utils_spark.functions.columns import (  # noqa: F401
    create_colname_to_value_map,
    cumulative_array,
    exact_median,
    group_median,
    random_uniform,
)
