"""JSON references, draft detection and the schema registry (pool).

Mirrors the reference's ``gojsonreference`` usage plus ``schemaPool.go`` and
``draft.go``:

- ``$id`` scopes register subtrees as addressable documents; relative ``$ref``
  strings are rewritten to absolute form against the innermost ``$id`` scope
  during a pre-parse walk (``schemaPool.go:48-137``).
- Lookup order: full-reference hit (location-independent identifiers) →
  fragment-stripped base + JSON-pointer walk → compile-time load for
  canonical refs (``schemaPool.go:139-215``): ``file://``, the embedded
  draft meta-schema URLs, and — like the reference's lazy mid-compile fetch
  (``schemaPool.go:187-204``, ``jsonLoader.go:180-204``) — http(s) via an
  injectable loader (``Registry(http_loader=...)``; the default uses
  urllib, with HTTP-status error text matching ``locales.go:432-435``).
  Preloading via ``Registry.add`` (``SchemaLoader.AddSchema``,
  ``schemaLoader.go:96-144``) still takes precedence and avoids all I/O.
- Draft auto-detection from ``$schema`` (``draft.go:90-125``); the official
  draft-04/06/07 meta-schemas ship embedded (``draft.go:45-63``) — vendored
  here as package data (public json-schema.org documents).
"""

from __future__ import annotations

import json
import os
import urllib.parse
from copy import deepcopy

from .errors import SchemaError
from .model import parse_json

# Draft versions (draft.go:29-34)
DRAFT4 = 4
DRAFT6 = 6
DRAFT7 = 7
HYBRID = 1 << 30

_META_DIR = os.path.join(os.path.dirname(__file__), "metaschemas")
META_SCHEMA_URLS = {
    "http://json-schema.org/draft-04/schema": (DRAFT4, "draft-04.json"),
    "http://json-schema.org/draft-06/schema": (DRAFT6, "draft-06.json"),
    "http://json-schema.org/draft-07/schema": (DRAFT7, "draft-07.json"),
}


def draft_from_schema_url(url: str) -> int | None:
    base = normalize_ref(url)
    hit = META_SCHEMA_URLS.get(base)
    return hit[0] if hit else None


def meta_schema_url_for(draft: int) -> str | None:
    for url, (d, _) in META_SCHEMA_URLS.items():
        if d == draft:
            return url
    return None


def load_meta_schema(url: str):
    hit = META_SCHEMA_URLS.get(normalize_ref(url).split("#", 1)[0])
    if hit is None:
        return None
    with open(os.path.join(_META_DIR, hit[1])) as f:
        return parse_json(f.read())


def normalize_ref(ref: str) -> str:
    """Canonical string form: no trailing empty fragment ('x#' == 'x')."""
    if ref.endswith("#"):
        return ref[:-1]
    return ref


def split_fragment(ref: str) -> tuple[str, str]:
    if "#" in ref:
        base, frag = ref.split("#", 1)
        return base, frag
    return ref, ""


def inherits(parent: str, child: str) -> str:
    """gojsonreference.Inherits: child wins if absolute, else resolve against
    parent (RFC3986 resolution; fragment-only refs keep the parent URL)."""
    parent = normalize_ref(parent)
    child_norm = normalize_ref(child)
    if not parent:
        return child_norm
    if not child_norm:
        return parent
    scheme = urllib.parse.urlsplit(child_norm).scheme
    if scheme:
        return child_norm
    return normalize_ref(urllib.parse.urljoin(parent, child))


def is_canonical(ref: str) -> bool:
    return bool(urllib.parse.urlsplit(ref).scheme)


def pointer_get(document, fragment: str):
    """RFC6901 pointer walk over a decoded JSON tree (fragment without '#')."""
    if fragment == "":
        return document
    node = document
    # fragment may be percent-encoded in the URL
    fragment = urllib.parse.unquote(fragment)
    if not fragment.startswith("/"):
        raise SchemaError(f'invalid JSON pointer: "{fragment}"')
    for raw in fragment.split("/")[1:]:
        token = raw.replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict):
            if token not in node:
                # error-text parity with the reference (schema_test.go:371-382)
                raise SchemaError(f"Object has no key '{token}'")
            node = node[token]
        elif isinstance(node, list):
            try:
                idx = int(token)
            except ValueError:
                raise SchemaError(f'invalid array index "{token}"')
            if idx < 0 or idx >= len(node):
                raise SchemaError(f"index {idx} out of bounds")
            node = node[idx]
        else:
            raise SchemaError(f'cannot descend into {type(node).__name__} with "{token}"')
    return node


_SCHEMA_CONTAINER_KEYS = ("properties", "dependencies", "patternProperties")


class Registry:
    """Schema pool: named documents + $id-scoped subtrees (schemaPool analog).

    Also the user-facing named-ruleset registry: ``registry.add(url, doc)``
    preloads documents so cross-document ``$ref`` resolves without I/O.
    """

    def __init__(self, auto_detect: bool = True, http_loader=None):
        self.documents: dict[str, tuple] = {}  # ref -> (doc, draft|None)
        self.auto_detect = auto_detect
        # callable url -> JSON text; None = default urllib fetcher; False =
        # DISABLE remote fetch (preload-only mode — any unresolved remote
        # $ref raises instead of touching the network).
        #
        # SECURITY: the default matches the reference (gojsonschema fetches
        # remote $refs with no scheme/host restriction), which means
        # compiling an UNTRUSTED schema can trigger arbitrary http(s)
        # requests from the compiling process (SSRF surface). Callers
        # validating untrusted schemas should pass http_loader=False (or a
        # hardened allow-listing loader) and preload needed documents via
        # Registry.add.
        self.http_loader = http_loader

    # -- public API (AddSchema / AddSchemas analog) --------------------------
    def add(self, url: str, doc) -> "Registry":
        self.parse_references(deepcopy(doc), normalize_ref(url), pooled=True)
        return self

    def add_unnamed(self, doc) -> "Registry":
        """AddSchemas analog: pool only by the $ids found inside."""
        self.parse_references(deepcopy(doc), "", pooled=False)
        return self

    # -- pool mechanics ------------------------------------------------------
    def parse_references(self, document, ref: str, pooled: bool = True):
        ref = normalize_ref(ref)
        if pooled and ref and ref in self.documents:
            # duplicate NAMED refs are an error (schemaPool.go:56-58);
            # the ANONYMOUS slot ("") is per-compile scratch — a shared
            # registry must support compiling many anonymous documents
            raise SchemaError(f'Reference already exists: "{ref}"')
        draft = None
        if self.auto_detect:
            draft = detect_draft(document)
        self._walk(document, ref, draft)
        if pooled:
            self.documents[ref] = (document, draft)
        return document

    def _walk(self, document, ref: str, draft):
        if isinstance(document, list):
            for v in document:
                self._walk(v, ref, draft)
            return
        if not isinstance(document, dict):
            return
        local_ref = ref
        # prefer draft-4 "id" when present (schemaPool.go:91-95)
        key_id = "id" if "id" in document else "$id"
        id_val = document.get(key_id)
        if isinstance(id_val, str):
            new_ref = inherits(ref, id_val)
            if new_ref in self.documents:
                raise SchemaError(f'Reference already exists: "{new_ref}"')
            self.documents[new_ref] = (document, draft)
            local_ref = new_ref
        ref_val = document.get("$ref")
        if isinstance(ref_val, str):
            document["$ref"] = inherits(local_ref, ref_val)
        for k, v in document.items():
            # const/enum bodies are literal data; property/dependency MAPS hold
            # names, not schemas (schemaPool.go:118-134)
            if k in ("const", "enum"):
                continue
            if k in _SCHEMA_CONTAINER_KEYS:
                if isinstance(v, dict):
                    for child in v.values():
                        self._walk(child, local_ref, draft)
            else:
                self._walk(v, local_ref, draft)

    def get_document(self, ref: str) -> tuple:
        """Returns (document_node, draft|None); raises SchemaError if unresolvable."""
        ref = normalize_ref(ref)
        if ref in self.documents:
            return self.documents[ref]
        base, frag = split_fragment(ref)
        if base in self.documents:
            doc, draft = self.documents[base]
            node = pointer_get(doc, frag)
            self.documents[ref] = (node, draft)
            return node, draft
        # compile-time load of canonical refs
        if not is_canonical(base):
            raise SchemaError(f'Reference must be canonical: "{ref}"')
        document = self._load_canonical(base)
        self.parse_references(document, base, pooled=True)
        # draft comes from the pool entry parse_references just wrote, so the
        # first call and later cached calls agree, and auto_detect=False is
        # honored (a forced-draft compiler must not have ref'd subtrees
        # silently parsed under their own $schema)
        _, draft = self.documents[base]
        node = pointer_get(document, frag) if frag else document
        if frag:
            self.documents[normalize_ref(ref)] = (node, draft)
        return node, draft

    def _load_canonical(self, base: str):
        # embedded meta-schemas answer without I/O, mirroring the reference's
        # cached drafts.GetMetaSchema fast path (jsonLoader.go:182-186)
        meta = load_meta_schema(base)
        if meta is not None:
            return meta
        parts = urllib.parse.urlsplit(base)
        if parts.scheme == "file":
            path = urllib.parse.unquote(parts.path)
            with open(path) as f:
                return parse_json(f.read())
        if parts.scheme in ("http", "https"):
            if self.http_loader is False:  # preload-only opt-out
                raise SchemaError(
                    f'Could not resolve reference "{base}": remote fetch '
                    "disabled (Registry(http_loader=False)); preload it via "
                    "Registry.add")
            loader = self.http_loader or default_http_loader
            return parse_json(loader(base))
        raise SchemaError(
            f'Could not resolve reference "{base}": unsupported scheme '
            f'"{parts.scheme}"'
        )


def default_http_loader(url: str) -> str:
    """Lazy mid-compile remote fetch (schemaPool.go:187-204). Non-200
    responses raise with the reference's error text (locales.go:432-435:
    "Could not read schema from HTTP, response status is {status}")."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            status = getattr(resp, "status", 200)
            if status != 200:
                raise SchemaError(
                    "Could not read schema from HTTP, response status is "
                    f"{status} {getattr(resp, 'reason', '')}".rstrip())
            return resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        raise SchemaError(
            "Could not read schema from HTTP, response status is "
            f"{e.code} {e.reason}") from e
    except urllib.error.URLError as e:
        raise SchemaError(f'Could not access schema "{url}": {e.reason}') from e


def detect_draft(document) -> int | None:
    """parseSchemaURL analog (draft.go:90-125)."""
    if isinstance(document, bool):
        return None
    if not isinstance(document, dict):
        raise SchemaError("schema is invalid")
    url = document.get("$schema")
    if url is None:
        return None
    if not isinstance(url, str):
        raise SchemaError("$schema must be of type string")
    return draft_from_schema_url(url)


def load_json_file(path: str):
    with open(path) as f:
        return parse_json(f.read())
