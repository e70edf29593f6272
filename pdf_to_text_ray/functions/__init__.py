from .scalars import (  # noqa: F401
    extract_fenced_json,
    parse_float_or_zero,
    parse_int_or_zero,
    to_fixed,
)
