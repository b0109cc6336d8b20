from .relational import (
    anti_join,
    case_when_in,
    distinct_values,
    except_all,
    is_disjoint,
    semi_join,
    with_scalars,
)
from .topk import top_k_global, top_k_per_group
from .sampling import per_group_fraction, split_assign, stratified_sample

__all__ = [
    "with_scalars",
    "case_when_in",
    "anti_join",
    "semi_join",
    "except_all",
    "is_disjoint",
    "distinct_values",
    "top_k_per_group",
    "top_k_global",
    "per_group_fraction",
    "split_assign",
    "stratified_sample",
]
