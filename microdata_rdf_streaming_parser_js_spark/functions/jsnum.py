"""JavaScript ``Number.parseInt`` / ``Number.parseFloat`` parity.

The reference's number property handler
(/root/reference/lib/propertyhandler/ItemPropertyHandlerNumber.ts:22-31)
uses JS prefix-parsing semantics: ``parseInt('3abc', 10) === 3`` (not
NaN), ``parseFloat('1.5x') === 1.5``, leading whitespace skipped.
Python's int()/float() raise on those, so we port the JS behavior.
"""

from __future__ import annotations

import re

# JS WhiteSpace + LineTerminator set accepted by parseInt/parseFloat.
_JS_WS = "\t\n\v\f\r \xa0                　﻿"

_INT_RE = re.compile(r"^[+-]?[0-9]+")
_FLOAT_RE = re.compile(
    r"^[+-]?(?:Infinity|[0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?|\.[0-9]+(?:[eE][+-]?[0-9]+)?)"
)


def js_parse_int_ok(value: str) -> bool:
    """True iff ``Number.parseInt(value, 10)`` is not NaN."""
    return bool(_INT_RE.match(value.lstrip(_JS_WS)))


def js_parse_float_ok(value: str) -> bool:
    """True iff ``Number.parseFloat(value)`` is not NaN."""
    return bool(_FLOAT_RE.match(value.lstrip(_JS_WS)))
