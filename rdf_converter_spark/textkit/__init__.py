"""Byte-identical scalar text/time kernels (the P/R-critical layer).

Every function here reproduces the corresponding reference helper
bit-for-bit, *including its bugs* — they define the triple contract.
All are pure ``str -> str`` (or ``number -> str``) and are applied on
executors through Arrow-batched pandas UDFs only (never row-at-a-time
Spark UDFs).
"""

from .core import (  # noqa: F401
    LD_TO_DASH,
    PA_TO_DASH,
    YLE_TO_DASH,
    RADIO_CHANNELS,
    clean_string_ld,
    clean_string_pa,
    clean_string_yle,
    ld_scrub,
    ld_format_datetime,
    ld_format_duration,
    ld_end_datetime,
    ld_time_between,
    ld_time_after,
    pa_format_duration,
    pa_format_datetime,
    pa_format_date,
    pa_time_between,
    pa_time_after,
    seconds_to_time,
    time_to_seconds,
    preprocess_content,
    yle_format_date,
    yle_format_datetime,
    yle_duration_tc,
    yle_ms_time,
    parse_ld_credits,
    parse_pa_credit,
    sha1_hex,
)
