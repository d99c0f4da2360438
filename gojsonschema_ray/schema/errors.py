"""Result / error model mirroring the reference's ``Result``/``ResultError``
(``result.go:33-96``) and the 30-entry error-type catalog (``errors.go:213-313``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

# Error type slugs — exact parity with errors.go:213-313.
ERR_FALSE = "false"
ERR_REQUIRED = "required"
ERR_INVALID_TYPE = "invalid_type"
ERR_ANY_OF = "number_any_of"
ERR_ONE_OF = "number_one_of"
ERR_ALL_OF = "number_all_of"
ERR_NOT = "number_not"
ERR_MISSING_DEPENDENCY = "missing_dependency"
ERR_INTERNAL = "internal"
ERR_CONST = "const"
ERR_ENUM = "enum"
ERR_NO_ADDITIONAL_ITEMS = "array_no_additional_items"
ERR_MIN_ITEMS = "array_min_items"
ERR_MAX_ITEMS = "array_max_items"
ERR_UNIQUE = "unique"
ERR_CONTAINS = "contains"
ERR_MIN_PROPERTIES = "array_min_properties"
ERR_MAX_PROPERTIES = "array_max_properties"
ERR_ADDITIONAL_PROPERTY = "additional_property_not_allowed"
ERR_INVALID_PROPERTY_PATTERN = "invalid_property_pattern"
ERR_INVALID_PROPERTY_NAME = "invalid_property_name"
ERR_STRING_GTE = "string_gte"
ERR_STRING_LTE = "string_lte"
ERR_PATTERN = "pattern"
ERR_FORMAT = "format"
ERR_MULTIPLE_OF = "multiple_of"
ERR_NUMBER_GTE = "number_gte"
ERR_NUMBER_GT = "number_gt"
ERR_NUMBER_LTE = "number_lte"
ERR_NUMBER_LT = "number_lt"
ERR_CONDITION_THEN = "condition_then"
ERR_CONDITION_ELSE = "condition_else"


class SchemaError(ValueError):
    """Compile-time schema error (parseSchema rejection, schema.go:77-966)."""


@dataclass
class ValidationError:
    """One ResultError: type slug + dotted context + offending value + details."""

    type: str
    context: str  # dotted path, e.g. "(root).sr_hz"
    value: Any
    details: dict = field(default_factory=dict)

    @property
    def field(self) -> str:
        """Context minus the "(root)." prefix (result.go:94-96)."""
        if self.context == "(root)":
            return "(root)"
        return self.context[len("(root).") :]

    def __repr__(self):
        return f"<{self.type} at {self.context} value={self.value!r} {self.details}>"


class Result:
    """Error accumulator + score (result.go:84-90, 196-220).

    The score only matters for picking the "closest" anyOf/oneOf/contains
    branch when reporting errors; validity is score-independent.
    """

    __slots__ = ("errors", "score")

    def __init__(self):
        self.errors: list[ValidationError] = []
        self.score = 0

    def valid(self) -> bool:
        return not self.errors

    def add_error(self, type_: str, context: str, value, details: dict | None = None):
        self.errors.append(ValidationError(type_, context, value, details or {}))
        self.score -= 2  # result.go:214-218

    def merge_errors(self, other: "Result"):
        self.errors.extend(other.errors)
        self.score += other.score

    def increment_score(self):
        self.score += 1

    def __repr__(self):
        return f"<Result valid={self.valid()} errors={len(self.errors)}>"
