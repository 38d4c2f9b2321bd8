"""Row → typed-object binding.

Port of ``QueryResultMapper``
(/root/reference/src/AthenaTrinoClient/Mapping/QueryResultMapper.cs:14-84):
column-name → field binding that is case-insensitive, tolerant of
snake_case/camelCase differences, null-aware, and coercing — with errors
that carry the column/field context (QueryResultMapper.cs:60-69).

In Python the target is a dataclass (or any class with annotated fields);
snake_case is already the native convention so most bindings are identity,
but we keep the normalized-name match so ``CamelCase`` DTOs also bind.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import uuid
from decimal import Decimal
from typing import Any, Iterable, Type, TypeVar, get_args, get_origin, get_type_hints

from pyspark.sql import Row

from .errors import EngineError

__all__ = ["bind_rows", "bind_row", "coerce_scalar", "MappingError"]

T = TypeVar("T")


class MappingError(EngineError):
    """Row→object binding failed; names the column and target field
    (mirrors QueryResultMapper.cs:60-69 error context)."""


def _normalize(name: str) -> str:
    return name.replace("_", "").replace("-", "").lower()


_NONE_TYPE = type(None)


def _unwrap_optional(tp: Any) -> tuple[Any, bool]:
    origin = get_origin(tp)
    if origin is not None and str(origin) in ("typing.Union", "types.UnionType"):
        args = [a for a in get_args(tp) if a is not _NONE_TYPE]
        if len(args) == 1:
            return args[0], True
    if get_origin(tp) is type(int | None):  # pragma: no cover - defensive
        return tp, True
    return tp, False


def coerce_scalar(value: Any, target: Any | None = None) -> Any:
    """Coerce one scalar to a target python type.

    The conversion matrix of ``AthenaClient.ConvertScalarValue``
    (/root/reference/src/AthenaTrinoClient/AthenaClient.cs:92-104): None
    passes through, UUID strings parse to ``uuid.UUID``, numerics convert
    via the type constructor, everything else must already be assignable.
    """
    if value is None or target is None:
        return value
    target, _ = _unwrap_optional(target)
    if target is Any or isinstance(target, TypeVar):
        return value
    if isinstance(value, target) and not (target is int and isinstance(value, bool)):
        return value
    if target is uuid.UUID:
        return uuid.UUID(str(value))  # AthenaClient.cs:98-101
    if target is Decimal:
        return value if isinstance(value, Decimal) else Decimal(str(value))
    if target is float and isinstance(value, (int, Decimal)):
        return float(value)
    if target is int and isinstance(value, (float, Decimal)):
        return int(value)
    if target is str:
        return str(value)
    if target is bool and isinstance(value, (int,)):
        return bool(value)
    if target is dt.datetime and isinstance(value, dt.date):
        return dt.datetime(value.year, value.month, value.day)
    if target is dt.date and isinstance(value, dt.datetime):
        return value.date()
    try:
        return target(value)
    except Exception as exc:  # noqa: BLE001 - rewrap with context
        raise MappingError(
            f"cannot coerce value {value!r} ({type(value).__name__}) to {target}"
        ) from exc


def _field_types(cls: Type[T]) -> dict[str, Any]:
    if dataclasses.is_dataclass(cls):
        hints = get_type_hints(cls)
        return {f.name: hints.get(f.name, Any) for f in dataclasses.fields(cls)}
    return dict(get_type_hints(cls))


def bind_row(cls: Type[T], row: Row | dict[str, Any]) -> T:
    """Bind one Spark Row to an instance of ``cls``.

    Matching is exact-name first, then case/underscore-insensitive
    (QueryResultMapper.cs:24-27 + 75-84). Missing columns bind as None for
    Optional fields, error otherwise (QueryResultMapper.cs:42-48).
    """
    data = row.asDict() if isinstance(row, Row) else dict(row)
    norm = {_normalize(k): v for k, v in data.items()}
    kwargs: dict[str, Any] = {}
    for fname, ftype in _field_types(cls).items():
        if fname in data:
            raw = data[fname]
        elif _normalize(fname) in norm:
            raw = norm[_normalize(fname)]
        else:
            _, optional = _unwrap_optional(ftype)
            has_default = False
            if dataclasses.is_dataclass(cls):
                fld = {f.name: f for f in dataclasses.fields(cls)}[fname]
                has_default = (
                    fld.default is not dataclasses.MISSING
                    or fld.default_factory is not dataclasses.MISSING
                )
            if has_default:
                continue
            if optional:
                # Optional with no default binds explicitly to None — matches
                # the documented contract and QueryResultMapper.cs:42-48
                # (nullable properties bind null); plain `continue` would let
                # cls(**kwargs) raise TypeError for a required __init__ arg.
                kwargs[fname] = None
                continue
            raise MappingError(
                f"result set has no column matching field {cls.__name__}.{fname}; "
                f"columns: {sorted(data)}"
            )
        try:
            kwargs[fname] = coerce_scalar(raw, ftype)
        except MappingError:
            raise
        except Exception as exc:  # noqa: BLE001
            raise MappingError(
                f"failed to set {cls.__name__}.{fname} from column value {raw!r}"
            ) from exc
    return cls(**kwargs)


def bind_rows(cls: Type[T], rows: Iterable[Row]) -> list[T]:
    """``DeserializeResults<T>`` equivalent (QueryResultMapper.cs:14-73)."""
    return [bind_row(cls, r) for r in rows]
