"""RE2 pattern matching for the generic engine.

The reference's `pattern` semantics are Go `regexp` = RE2: unanchored
search, `$` means end-of-text, no lookarounds (schema.go:653-669,
validation.go:749-759). The vectorized path already runs RE2 via Arrow's
`match_substring_regex`; the generic per-document path matches through the
SAME kernel so the two engines cannot diverge (a Python `re` matcher
accepted lookarounds that later crashed Arrow on workers, and treated a
trailing newline as matched by `$`).

Compilation is validated eagerly: non-RE2 syntax raises SchemaError at
compile time, exactly where Go's regexp.Compile would reject it.
"""

from __future__ import annotations

from .errors import SchemaError


class Re2Pattern:
    """Drop-in for the `.search(value) -> truthy` surface the engine uses.

    Arrow's kernel recompiles the RE2 program per invocation, so results are
    memoized per distinct value (bounded): the generic engine's hot loop
    re-checks the same patternProperties field names and repeated values
    document after document, which the memo turns into dict lookups."""

    __slots__ = ("pattern", "_memo")

    _MEMO_CAP = 4096

    def __init__(self, pattern: str, validate: bool = True):
        self.pattern = pattern
        self._memo: dict = {}
        if validate:
            import pyarrow as pa
            import pyarrow.compute as pc

            try:
                pc.match_substring_regex(pa.array([""]), pattern)
            except Exception as e:  # ArrowInvalid on non-RE2 syntax
                raise SchemaError(
                    f"pattern must be a valid regular expression: {pattern!r}"
                ) from e

    def search(self, value) -> bool:
        if not isinstance(value, str):
            return False
        hit = self._memo.get(value)
        if hit is not None:
            return hit
        import pyarrow as pa
        import pyarrow.compute as pc

        r = bool(pc.match_substring_regex(
            pa.array([value]), self.pattern)[0].as_py())
        if len(self._memo) >= self._MEMO_CAP:
            self._memo.clear()
        self._memo[value] = r
        return r

    def __getstate__(self):
        return self.pattern

    def __setstate__(self, state):
        self.pattern = state  # already validated at compile time
        self._memo = {}

    def __repr__(self):
        return f"Re2Pattern({self.pattern!r})"
