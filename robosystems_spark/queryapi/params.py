"""Query-parameter validation.

Limits per the reference's typed param binding
(/root/reference/robosystems/graph_api/core/ladybug/engine.py:223-293):
nesting depth <= 3, arrays <= 1000 items, strings <= 10k chars,
objects <= 100 keys; only JSON-ish scalar/collection types.
"""

from __future__ import annotations

import datetime

MAX_DEPTH = 3
MAX_ARRAY_ITEMS = 1000
MAX_STRING_CHARS = 10_000
MAX_OBJECT_KEYS = 100

_SCALARS = (str, int, float, bool, bytes, datetime.date, datetime.datetime, type(None))


class ParamValidationError(ValueError):
    pass


def validate_params(params: dict | None) -> dict:
    """Validate and return the params dict (empty dict for None)."""
    if params is None:
        return {}
    if not isinstance(params, dict):
        raise ParamValidationError("Parameters must be a mapping")
    for key, value in params.items():
        if not isinstance(key, str):
            raise ParamValidationError(f"Parameter name {key!r} must be a string")
        _validate_value(key, value, depth=1)
    return params


def _validate_value(name: str, value, depth: int) -> None:
    if depth > MAX_DEPTH:
        raise ParamValidationError(
            f"Parameter {name!r} exceeds max nesting depth {MAX_DEPTH}"
        )
    if isinstance(value, str):
        if len(value) > MAX_STRING_CHARS:
            raise ParamValidationError(
                f"Parameter {name!r} string exceeds {MAX_STRING_CHARS} chars"
            )
        return
    if isinstance(value, _SCALARS):
        return
    if isinstance(value, (list, tuple)):
        if len(value) > MAX_ARRAY_ITEMS:
            raise ParamValidationError(
                f"Parameter {name!r} array exceeds {MAX_ARRAY_ITEMS} items"
            )
        for i, item in enumerate(value):
            _validate_value(f"{name}[{i}]", item, depth + 1)
        return
    if isinstance(value, dict):
        if len(value) > MAX_OBJECT_KEYS:
            raise ParamValidationError(
                f"Parameter {name!r} object exceeds {MAX_OBJECT_KEYS} keys"
            )
        for k, v in value.items():
            _validate_value(f"{name}.{k}", v, depth + 1)
        return
    raise ParamValidationError(
        f"Parameter {name!r} has unsupported type {type(value).__name__}"
    )
