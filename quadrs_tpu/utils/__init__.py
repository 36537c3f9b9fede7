from quadrs_tpu.utils.si import (
    parse_si_int,
    parse_si_uint,
    parse_si_float,
    parse_bool,
)
from quadrs_tpu.utils.sniff import guess_details, guess_format_from_name

__all__ = [
    "parse_si_int",
    "parse_si_uint",
    "parse_si_float",
    "parse_bool",
    "guess_details",
    "guess_format_from_name",
]
