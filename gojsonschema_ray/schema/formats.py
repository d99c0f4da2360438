"""Format checkers — the 17 built-ins of the reference plus a user-extensible
registry (reference ``format_checkers.go:110-368``).

Contract (mirrors the reference exactly):
- unknown format name  -> always valid (``format_checkers.go:182-185``)
- non-string input     -> valid for every built-in (type-assert escape,
  ``format_checkers.go:192-195``), but *custom* checkers may target any kind
  (``format_checkers_test.go:29-143``)
- ``format`` applies to every value kind via the common validator
  (``validation.go:444-453``)

Two evaluation surfaces:
- scalar: ``is_format(name, value) -> bool`` (generic/row path)
- vectorized: ``vector_is_format(name, arr) -> pyarrow.BooleanArray`` for the
  hot table path; built on ``pyarrow.compute`` regex kernels where a format is
  regex-expressible, else a distinct-value cache around the scalar checker
  (low-cardinality columns pay the Python cost once per distinct value).
"""

from __future__ import annotations

import ipaddress
import re
import threading
from datetime import datetime
from typing import Callable

# ---------------------------------------------------------------------------
# Scalar checkers
# ---------------------------------------------------------------------------

_RX_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}\Z")
# Go's time.Parse accepts a fractional second after the seconds field even
# when the layout omits it — mirror that ((\.\d+)? below).
_RX_TIME_OFFSET = re.compile(r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?(Z|[+-]\d{2}:\d{2})\Z")
_RX_TIME_PLAIN = re.compile(r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?\Z")
_RX_DATETIME = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[T](\d{2}):(\d{2}):(\d{2})(\.\d+)?(Z|[+-]\d{2}:\d{2})\Z"
)
# Hostname per the reference (format_checkers.go:133): labels of 1-63
# alphanumeric/hyphen chars, not starting/ending with hyphen; total len < 256.
_RX_HOSTNAME = re.compile(
    r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])"
    r"(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*\Z"
)
_RX_UUID = re.compile(r"^[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{12}\Z")
_RX_JSON_POINTER = re.compile(r"^(?:/(?:[^~/]|~0|~1)*)*\Z")
_RX_REL_JSON_POINTER = re.compile(r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~/]|~0|~1)*)*)\Z")
_RX_URI_TEMPLATE_BRACES = re.compile(r"^([^{}]*(\{[^{}]*\})?)*\Z")
# RFC5322-ish addr-spec: dot-atom or quoted-string local part, dot-atom or
# [literal] domain; optional display-name with angle brackets (mail.ParseAddress
# accepts name-addr form, format_checkers.go:191-199).
# Go's mail.ParseAddress accepts UTF-8 atext (RFC 6532) — include non-ASCII.
_ATEXT = r"(?:[A-Za-z0-9!#$%&'*+/=?^_`{|}~\-]|[^\x00-\x7f])"
_ALNUM = r"(?:[A-Za-z0-9]|[^\x00-\x7f])"
_LABEL = rf"{_ALNUM}(?:(?:[A-Za-z0-9\-]|[^\x00-\x7f])*{_ALNUM})?"
_RX_ADDR_SPEC = re.compile(
    rf"^(?:{_ATEXT}+(?:\.{_ATEXT}+)*|\"(?:[^\"\\]|\\.)*\")"
    rf"@(?:{_LABEL}(?:\.{_LABEL})*|\[[^\[\]]+\])\Z"
)
_RX_PCT_BAD = re.compile(r"%(?![0-9A-Fa-f]{2})")
_RX_CTRL_OR_SPACE_IN_AUTHORITY = re.compile(r"[\x00-\x20]")


def _valid_hms(h: str, m: str, s: str) -> bool:
    return int(h) < 24 and int(m) < 60 and int(s) < 60


def check_date(v) -> bool:
    if not isinstance(v, str):
        return True
    if not _RX_DATE.match(v):
        return False
    try:
        datetime.strptime(v, "%Y-%m-%d")
        return True
    except ValueError:
        return False


def check_time(v) -> bool:
    if not isinstance(v, str):
        return True
    m = _RX_TIME_OFFSET.match(v) or _RX_TIME_PLAIN.match(v)
    return bool(m) and _valid_hms(m.group(1), m.group(2), m.group(3))


def check_datetime(v) -> bool:
    """RFC3339(Nano) — the reference ALSO accepts a bare date or bare time
    (layout cascade at format_checkers.go:226-247)."""
    if not isinstance(v, str):
        return True
    if check_date(v) or check_time(v):
        return True
    m = _RX_DATETIME.match(v)
    if not m:
        return False
    try:
        datetime.strptime(f"{m.group(1)}-{m.group(2)}-{m.group(3)}", "%Y-%m-%d")
    except ValueError:
        return False
    return _valid_hms(m.group(4), m.group(5), m.group(6))


def check_hostname(v) -> bool:
    if not isinstance(v, str):
        return True
    return len(v) < 256 and bool(_RX_HOSTNAME.match(v))


def check_email(v) -> bool:
    if not isinstance(v, str):
        return True
    s = v.strip()
    # name-addr form: optional display name then <addr-spec>
    if s.endswith(">") and "<" in s:
        s = s[s.rindex("<") + 1 : -1]
    return bool(_RX_ADDR_SPEC.match(s))


def check_ipv4(v) -> bool:
    """net.ParseIP(v) ok AND contains "." (format_checkers.go:202-211) —
    IPv4-mapped IPv6 like ::ffff:1.2.3.4 is VALID in the reference."""
    if not isinstance(v, str):
        return True
    if "." not in v or "%" in v:
        return False
    try:
        ipaddress.ip_address(v)
        return True
    except ValueError:
        return False


def check_ipv6(v) -> bool:
    """net.ParseIP(v) ok AND contains ":" — Go rejects zone IDs (%eth0),
    Python's ipaddress accepts them, so reject '%' explicitly."""
    if not isinstance(v, str):
        return True
    if ":" not in v or "%" in v:
        return False
    try:
        ipaddress.ip_address(v)
        return True
    except ValueError:
        return False


def _uri_parse_ok(v: str) -> bool:
    """Approximate Go's url.Parse failure modes: backslash anywhere fails the
    reference checkers explicitly; bad percent escapes and control chars /
    spaces in the authority or path fail parsing."""
    if "\\" in v:
        return False
    if _RX_PCT_BAD.search(v):
        return False
    # control characters anywhere fail url.Parse; SPACES are legal in the
    # path (Go's url.Parse accepts "http://h/a b") but not in the authority
    if any(ord(c) < 0x20 or c == "\x7f" for c in v):
        return False
    rest = v.split("#", 1)[0]
    if "//" in rest:
        authority = rest.split("//", 1)[1].split("/", 1)[0].split("?", 1)[0]
        if _RX_CTRL_OR_SPACE_IN_AUTHORITY.search(authority):
            return False
    return True


def _scheme_of(v: str) -> str:
    m = re.match(r"^([A-Za-z][A-Za-z0-9+\-.]*):", v)
    return m.group(1) if m else ""


def check_uri(v) -> bool:
    if not isinstance(v, str):
        return True
    return _uri_parse_ok(v) and _scheme_of(v) != ""


def check_uri_reference(v) -> bool:
    if not isinstance(v, str):
        return True
    return _uri_parse_ok(v)


def check_uri_template(v) -> bool:
    if not isinstance(v, str):
        return True
    if not _uri_parse_ok(v):
        return False
    # the reference checks brace balance on the *path* component only
    path = v.split("#", 1)[0].split("?", 1)[0]
    if "://" in path:
        path = path.split("://", 1)[1]
        path = path[path.find("/") :] if "/" in path else ""
    return bool(_RX_URI_TEMPLATE_BRACES.match(path))


def check_uuid(v) -> bool:
    if not isinstance(v, str):
        return True
    return bool(_RX_UUID.match(v))


def check_regex(v) -> bool:
    if not isinstance(v, str):
        return True
    if v == "":
        return True
    try:
        re.compile(v)
        return True
    except re.error:
        return False


def check_json_pointer(v) -> bool:
    if not isinstance(v, str):
        return True
    return bool(_RX_JSON_POINTER.match(v))


def check_rel_json_pointer(v) -> bool:
    if not isinstance(v, str):
        return True
    return bool(_RX_REL_JSON_POINTER.match(v))


# ---------------------------------------------------------------------------
# Registry (FormatCheckerChain analog, format_checkers.go:144-188)
# ---------------------------------------------------------------------------

_BUILTINS: dict[str, Callable] = {
    "date": check_date,
    "time": check_time,
    "date-time": check_datetime,
    "hostname": check_hostname,
    "email": check_email,
    "idn-email": check_email,
    "ipv4": check_ipv4,
    "ipv6": check_ipv6,
    "uri": check_uri,
    "iri": check_uri,
    "uri-reference": check_uri_reference,
    "iri-reference": check_uri_reference,
    "uri-template": check_uri_template,
    "uuid": check_uuid,
    "regex": check_regex,
    "json-pointer": check_json_pointer,
    "relative-json-pointer": check_rel_json_pointer,
}

# Regex-only formats get a fully vectorized Arrow kernel.
_VECTOR_REGEX: dict[str, str] = {
    "uuid": r"^[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{12}$",
    "json-pointer": r"^(/([^~/]|~0|~1)*)*$",
    "relative-json-pointer": r"^(0|[1-9][0-9]*)(#|(/([^~/]|~0|~1)*)*)$",
    # hostname/ipv4 deliberately ABSENT: hostname needs the len<256 check
    # and ipv4 must accept IPv4-mapped ::ffff:a.b.c.d like net.ParseIP —
    # both run on the distinct-value dictionary path for exact scalar parity
    "date": r"^\d{4}-\d{2}-\d{2}$",
}


class FormatRegistry:
    """Thread-safe, user-extensible (mirrors FormatCheckers.Add/Remove/Has)."""

    def __init__(self):
        self._lock = threading.RLock()
        self._checkers: dict[str, Callable] = dict(_BUILTINS)
        self._vector: dict[str, Callable] = {}

    def register(self, name: str, fn: Callable, vector_fn: Callable | None = None):
        """fn: value -> bool. vector_fn (optional): pa.Array -> pa.BooleanArray."""
        with self._lock:
            self._checkers[name] = fn
            if vector_fn is not None:
                self._vector[name] = vector_fn
        return self

    def remove(self, name: str):
        with self._lock:
            self._checkers.pop(name, None)
            self._vector.pop(name, None)
        return self

    def has(self, name: str) -> bool:
        with self._lock:
            return name in self._checkers

    def get(self, name: str):
        """(scalar_fn, vector_fn|None) — used to capture CUSTOM checkers
        into compiled trees so they ship to Ray workers."""
        with self._lock:
            return self._checkers.get(name), self._vector.get(name)

    def is_format(self, name: str, value) -> bool:
        with self._lock:
            fn = self._checkers.get(name)
        if fn is None:
            return True  # unknown format always passes
        return bool(fn(value))

    def vector_is_format(self, name: str, arr):
        """pa.Array(string) -> pa.BooleanArray of per-value verdicts.

        Null slots return null (caller folds nulls via applicability mask).
        Regex-expressible formats run as one Arrow kernel; the rest go through
        a distinct-value dictionary so the scalar checker runs once per
        distinct value, not per row.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        with self._lock:
            if name not in self._checkers:
                return pa.array([True] * len(arr), type=pa.bool_())
            vfn = self._vector.get(name)
        if vfn is not None:
            return vfn(arr)
        rx = _VECTOR_REGEX.get(name)
        if rx is not None and name not in ("date",):
            return pc.match_substring_regex(arr, rx)
        # distinct-value cache path (also covers "date"'s range validation)
        dictarr = pc.dictionary_encode(arr)
        uniques = dictarr.dictionary if isinstance(dictarr, pa.DictionaryArray) else dictarr.chunk(0).dictionary
        verdicts = pa.array([self.is_format(name, u) for u in uniques.to_pylist()], type=pa.bool_())
        indices = dictarr.indices if isinstance(dictarr, pa.DictionaryArray) else pa.chunked_array([c.indices for c in dictarr.chunks]).combine_chunks()
        return pc.take(verdicts, indices)


FORMATS = FormatRegistry()
