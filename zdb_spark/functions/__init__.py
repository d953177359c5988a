from .scalar import (format_currency, nanos_to_ts, string_to_nanoseconds,
                     to_nanos, ts_to_nanos)

__all__ = ["format_currency", "nanos_to_ts", "string_to_nanoseconds",
           "to_nanos", "ts_to_nanos"]
