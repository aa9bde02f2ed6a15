"""IRI validation and RFC 3986 relative-reference resolution.

Pure-Python, no Spark imports — used inside the Arrow-vectorized
extraction UDF and directly unit-testable.

Semantics parity targets (reference, read-only):
- IRI validity regex: /root/reference/lib/Util.ts:15
- resolution behavior of the ``relative-to-absolute-iri`` package as
  exercised by the reference tests, e.g. hash-relative itemid
  (test/MicrodataRdfParser-test.ts:228-244), relative itemid with no
  base -> error -> blank-node fallback (:213-227), and
  ``deriveVocab``'s ``resolve('.', typeIri)`` (lib/Util.ts:143,
  test/Util-test.ts:44-68).
"""

from __future__ import annotations

import re

# Port of the reference IRI regex (lib/Util.ts:15). The char class
# `+-.` is an ASCII range (includes ','), kept verbatim for parity.
_IRI_RE = re.compile(r'^([A-Za-z][\d+-.A-Za-z]*|_):[^ "<>\[\\\]`{|}]*$')

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]*:")


def is_valid_iri(iri: str) -> bool:
    """True if ``iri`` is an absolute IRI per the reference's regex."""
    return bool(_IRI_RE.match(iri))


class InvalidIriError(ValueError):
    """Raised when a relative IRI cannot be resolved against the base."""


def _split_iri(iri: str):
    """Split an IRI into (scheme, authority, path, query, fragment).

    scheme includes no ':'; authority is None when absent ('' is a
    valid empty authority as in 'file:///x'); query/fragment are None
    when absent and keep no leading '?'/'#'.
    """
    m = _SCHEME_RE.match(iri)
    scheme = None
    rest = iri
    if m:
        scheme = iri[: m.end() - 1]
        rest = iri[m.end():]
    fragment = None
    hash_pos = rest.find("#")
    if hash_pos >= 0:
        fragment = rest[hash_pos + 1:]
        rest = rest[:hash_pos]
    query = None
    q_pos = rest.find("?")
    if q_pos >= 0:
        query = rest[q_pos + 1:]
        rest = rest[:q_pos]
    authority = None
    path = rest
    if rest.startswith("//"):
        slash = rest.find("/", 2)
        if slash < 0:
            authority = rest[2:]
            path = ""
        else:
            authority = rest[2:slash]
            path = rest[slash:]
    return scheme, authority, path, query, fragment


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                slash = path.find("/", 1)
            else:
                slash = path.find("/")
            if slash < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:slash])
                path = path[slash:]
    return "".join(out)


def _recompose(scheme, authority, path, query, fragment) -> str:
    parts = []
    if scheme is not None:
        parts.append(scheme + ":")
    if authority is not None:
        parts.append("//" + authority)
    parts.append(path)
    if query is not None:
        parts.append("?" + query)
    if fragment is not None:
        parts.append("#" + fragment)
    return "".join(parts)


def resolve_iri(reference: str, base: str) -> str:
    """Resolve ``reference`` against ``base`` per RFC 3986 §5.2.

    Raises :class:`InvalidIriError` when the base IRI has no scheme and
    the reference is not itself absolute (the reference library throws;
    the caller falls back to a blank node,
    lib/MicrodataRdfParser.ts:155-156, lib/Util.ts:96-105).
    """
    r_scheme, r_auth, r_path, r_query, r_frag = _split_iri(reference)
    if r_scheme is not None:
        return _recompose(
            r_scheme, r_auth, _remove_dot_segments(r_path), r_query, r_frag
        )

    b_scheme, b_auth, b_path, b_query, _b_frag = _split_iri(base)
    if b_scheme is None:
        raise InvalidIriError(f"Found invalid baseIRI '{base}' for relative IRI '{reference}'")

    if r_auth is not None:
        t_auth, t_path, t_query = r_auth, _remove_dot_segments(r_path), r_query
    else:
        if not r_path:
            t_path = b_path
            t_query = r_query if r_query is not None else b_query
        else:
            if r_path.startswith("/"):
                t_path = _remove_dot_segments(r_path)
            else:
                if b_auth is not None and not b_path:
                    merged = "/" + r_path
                else:
                    merged = b_path[: b_path.rfind("/") + 1] + r_path
                t_path = _remove_dot_segments(merged)
            t_query = r_query
        t_auth = b_auth
    return _recompose(b_scheme, t_auth, t_path, t_query, r_frag)
