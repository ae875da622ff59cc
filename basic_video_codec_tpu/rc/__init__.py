from .rate_control import (
    bit_budget_per_frame,
    calculate_constant_row_bit_budget,
    calculate_proportional_row_bit_budget,
    find_rc_qp_for_row,
)
from .lookup import (
    rc_lookup_file_path,
    get_combined_lookup_table,
    load_lookup_table,
    generate_rc_lookup,
    EMBEDDED_LOOKUPS,
)

__all__ = [
    "bit_budget_per_frame",
    "calculate_constant_row_bit_budget",
    "calculate_proportional_row_bit_budget",
    "find_rc_qp_for_row",
    "rc_lookup_file_path",
    "get_combined_lookup_table",
    "load_lookup_table",
    "generate_rc_lookup",
    "EMBEDDED_LOOKUPS",
]
