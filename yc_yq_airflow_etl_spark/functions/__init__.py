"""Expression helpers: JVM-side scalar functions first, Pandas UDFs last."""

from .scalar import (  # noqa: F401
    date_lit,
    get_year,
    to_datetime,
    to_uint32,
    unwrap,
)
