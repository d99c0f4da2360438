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


# Default human-readable description templates per error type — the engine's
# analog of the reference's locale format-strings (locales.go:196-400) and
# the per-type SetDescription override hook (errors.go:332-364, README
# "Formatting custom error messages"). Placeholders pull from the error's
# details dict plus {field}; unknown placeholders render verbatim.
DESCRIPTION_TEMPLATES: dict[str, str] = {
    ERR_FALSE: "False always fails validation",
    ERR_REQUIRED: "{property} is required",
    ERR_INVALID_TYPE: "Invalid type. Expected: {expected}, given: {given}",
    ERR_ANY_OF: "Must validate at least one schema (anyOf)",
    ERR_ONE_OF: "Must validate one and only one schema (oneOf)",
    ERR_ALL_OF: "Must validate all the schemas (allOf)",
    ERR_NOT: "Must not validate the schema (not)",
    ERR_MISSING_DEPENDENCY: "Has a dependency on {dependency}",
    ERR_INTERNAL: "Internal Error {error}",
    ERR_CONST: "{field} does not match: {allowed}",
    ERR_ENUM: "{field} must be one of the following: {allowed}",
    ERR_NO_ADDITIONAL_ITEMS: "No additional items allowed on array",
    ERR_MIN_ITEMS: "Array must have at least {min} items",
    ERR_MAX_ITEMS: "Array must have at most {max} items",
    ERR_UNIQUE: "{type} items[{i},{j}] must be unique",
    ERR_CONTAINS: "At least one of the items must match",
    ERR_MIN_PROPERTIES: "Must have at least {min} properties",
    ERR_MAX_PROPERTIES: "Must have at most {max} properties",
    ERR_ADDITIONAL_PROPERTY: "Additional property {property} is not allowed",
    ERR_INVALID_PROPERTY_PATTERN: 'Property "{property}" does not match pattern {pattern}',
    ERR_INVALID_PROPERTY_NAME: 'Property name of "{property}" does not match',
    ERR_STRING_GTE: "String length must be greater than or equal to {min}",
    ERR_STRING_LTE: "String length must be less than or equal to {max}",
    ERR_PATTERN: "Does not match pattern '{pattern}'",
    ERR_FORMAT: "Does not match format '{format}'",
    ERR_MULTIPLE_OF: "Must be a multiple of {multiple}",
    ERR_NUMBER_GTE: "Must be greater than or equal to {min}",
    ERR_NUMBER_GT: "Must be strictly greater than {min}",
    ERR_NUMBER_LTE: "Must be less than or equal to {max}",
    ERR_NUMBER_LT: "Must be strictly less than {max}",
    ERR_CONDITION_THEN: 'Must validate "then" as "if" was valid',
    ERR_CONDITION_ELSE: 'Must validate "else" as "if" was not valid',
}


def set_description(type_: str, template: str) -> None:
    """Override the description template for an error type
    (FormatCheckers-style global registry, mirrors SetDescription)."""
    DESCRIPTION_TEMPLATES[type_] = template


class _SafeDict(dict):
    def __missing__(self, key):  # leave unknown placeholders visible
        return "{" + key + "}"


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

    def describe(self) -> str:
        """Rendered human description (ResultError.Description, the
        reference's templated locale strings)."""
        tpl = DESCRIPTION_TEMPLATES.get(self.type, self.type)
        return tpl.format_map(_SafeDict({"field": self.field, **self.details}))

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
