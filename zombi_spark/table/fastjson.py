"""JSON for the hot metadata paths (snapshot log: parsed on every read
plan, written on every commit — both O(live files) documents).

Uses orjson when available (the Rust serializer is ~10-20× stdlib for
these list-of-dicts shapes); falls back to the stdlib so nothing here is
a hard dependency. Output stays indented either way — snapshot files are
the primary on-disk debugging surface and diffs in code review read them.

Only safe for zombi's own metadata documents: orjson rejects non-finite
floats and non-string keys, both of which the stdlib path would also
have no business emitting into a snapshot (NaN would not round-trip as
valid JSON at all).
"""

from __future__ import annotations

import json

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
        if isinstance(path_or_fh, str):
            with open(path_or_fh, "w") as fh:
                json.dump(obj, fh, indent=1)
        else:
            json.dump(obj, path_or_fh, indent=1)

    def load_from(path: str):
        with open(path) as fh:
            return json.load(fh)
