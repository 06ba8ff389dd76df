"""Column-expression factories: transforms and filters.

Reference parity for ``transform/transforms.go`` and ``filter/filters.go``
— but as lazy Column expressions that stay inside whole-stage codegen, not
per-record Go closures.
"""

from goetl_spark.functions.transforms import (
    add_field,
    convert_type,
    go_layout_to_java,
    parse_time,
    remove_fields,
    rename,
    select,
    to_lower,
    to_upper,
    trim_space,
)
from goetl_spark.functions.filters import (
    all_of,
    any_of,
    between,
    contains,
    custom,
    ends_with,
    equals,
    greater_than,
    is_in,
    less_than,
    matches_regex,
    not_,
    not_null,
    starts_with,
)

__all__ = [
    "select", "rename", "add_field", "remove_fields", "convert_type",
    "trim_space", "to_upper", "to_lower", "parse_time", "go_layout_to_java",
    "not_null", "equals", "contains", "starts_with", "ends_with",
    "matches_regex", "greater_than", "less_than", "between", "is_in",
    "all_of", "any_of", "not_", "custom",
]
