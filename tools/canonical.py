"""Order-insensitive canonical row comparison shared by the oracle gate
(`check_correctness.py`) and the differential fuzzer
(`fuzz_differential.py`): exact for ints/strings/bools/dates, full-
precision for floats (the engine's queries are built bit-deterministic)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def canon(v):
    if v is None:
        return ("_null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("D", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon(x) for x in v))
    return ("s", str(v))


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)
