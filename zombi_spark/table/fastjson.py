"""JSON for the hot metadata paths (snapshot log: parsed on every read
plan, written on every commit — both O(live files) documents).

Uses orjson when available (the Rust serializer is ~10-20× stdlib for
these list-of-dicts shapes); falls back to the stdlib so nothing here is
a hard dependency.

Byte-stability contract (r16 ADVICE): both paths emit the SAME bytes for
zombi's metadata documents — 2-space indent, UTF-8 (no ``\\uXXXX``
escapes), no NaN/Infinity — so on-disk snapshots do not depend on which
serializer the environment happens to have. The documents themselves must
be built from **dicts with str keys, lists (not tuples), str, int, bool,
None and finite floats**; the fallback enforces the parts the stdlib
would otherwise silently coerce (tuples → arrays, int keys → str) so a
contract violation fails identically in both environments instead of
producing environment-dependent bytes. Floats are the one documented
residual: exponent formatting can differ between serializers (``1e+300``
vs ``1e300``) — zombi metadata stores counts/sizes/timestamps as ints,
never floats, so this does not arise in practice.
"""

from __future__ import annotations

import json


def _assert_contract(obj, path="$") -> None:
    """Reject shapes orjson rejects, so the stdlib fallback fails the
    same way instead of silently coercing (tuples, non-str dict keys)."""
    if isinstance(obj, dict):
        for k, v in obj.items():
            if not isinstance(k, str):
                raise TypeError(
                    f"fastjson: non-str dict key {k!r} at {path} — metadata "
                    "documents must use str keys (orjson would reject this)"
                )
            _assert_contract(v, f"{path}.{k}")
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            _assert_contract(v, f"{path}[{i}]")
    elif isinstance(obj, tuple):
        raise TypeError(
            f"fastjson: tuple at {path} — metadata documents must use "
            "lists (orjson would reject this)"
        )


try:  # pragma: no cover - exercised implicitly by every table test
    import orjson

    def dump_to(path_or_fh, obj) -> None:
        b = orjson.dumps(obj, option=orjson.OPT_INDENT_2)
        if isinstance(path_or_fh, str):
            with open(path_or_fh, "wb") as fh:
                fh.write(b)
        else:
            path_or_fh.write(b.decode("utf-8"))

    def load_from(path: str):
        with open(path, "rb") as fh:
            return orjson.loads(fh.read())

except ImportError:  # pragma: no cover

    def dump_to(path_or_fh, obj) -> None:
        _assert_contract(obj)
        # indent=2 + ensure_ascii=False + allow_nan=False == orjson's
        # OPT_INDENT_2 bytes for the contract shapes above
        if isinstance(path_or_fh, str):
            with open(path_or_fh, "w", encoding="utf-8") as fh:
                json.dump(obj, fh, indent=2, ensure_ascii=False, allow_nan=False)
        else:
            json.dump(obj, path_or_fh, indent=2, ensure_ascii=False, allow_nan=False)

    def load_from(path: str):
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
