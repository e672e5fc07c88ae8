"""Program-argument utility — the reference's ``ParameterTool``
(``flink-java/.../utils/ParameterTool.java``), which every example
program in the artifact uses (``ParameterTool.fromArgs(args)`` then
``params.get("input")`` / ``getRequired`` / ``getInt``).

Faithful to the fromArgs grammar (ParameterTool.java:65-95): ``--key``
or ``-key`` introduces a key; the next token is its value unless it is
itself a key or missing (then the key maps to the NO_VALUE marker); a
numeric token is always a value even when it starts with ``-`` (negative
numbers are not mistaken for keys). Properties files and merging mirror
fromPropertiesFile / mergeWith.
"""

from __future__ import annotations

import re

NO_VALUE_KEY = "__NO_VALUE_KEY"

_NUMBER = re.compile(r"^-?\d+(\.\d+)?$")


class ParameterTool:
    def __init__(self, data: dict[str, str]):
        self._data = dict(data)

    # -- constructors -------------------------------------------------
    @classmethod
    def from_args(cls, args: list[str]) -> "ParameterTool":
        data: dict[str, str] = {}
        i = 0
        while i < len(args):
            tok = args[i]
            if tok.startswith("--"):
                key = tok[2:]
            elif tok.startswith("-") and not _NUMBER.match(tok):
                key = tok[1:]
            else:
                raise ValueError(f"Error parsing arguments: {tok!r} is not a key")
            if not key:
                raise ValueError(f"The input {args} contains an empty argument")
            i += 1
            if i >= len(args):
                data[key] = NO_VALUE_KEY
            elif _NUMBER.match(args[i]):
                data[key] = args[i]
                i += 1
            elif args[i].startswith("-"):
                data[key] = NO_VALUE_KEY
            else:
                data[key] = args[i]
                i += 1
        return cls(data)

    @classmethod
    def from_properties_file(cls, path: str) -> "ParameterTool":
        data: dict[str, str] = {}
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith(("#", "!")):
                    continue
                key, _, value = line.partition("=")
                data[key.strip()] = value.strip()
        return cls(data)

    @classmethod
    def from_map(cls, data: dict[str, str]) -> "ParameterTool":
        return cls(data)

    # -- accessors ----------------------------------------------------
    def has(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str, default: str | None = None) -> str | None:
        return self._data.get(key, default)

    def get_required(self, key: str) -> str:
        if key not in self._data:
            raise KeyError(f"No data for required key '{key}'")
        return self._data[key]

    def get_int(self, key: str, default: int | None = None) -> int | None:
        v = self._data.get(key)
        return int(v) if v is not None else default

    def get_float(self, key: str, default: float | None = None) -> float | None:
        v = self._data.get(key)
        return float(v) if v is not None else default

    def get_boolean(self, key: str, default: bool | None = None) -> bool | None:
        v = self._data.get(key)
        return v.lower() == "true" if v is not None else default

    def to_map(self) -> dict[str, str]:
        return dict(self._data)

    def merge_with(self, other: "ParameterTool") -> "ParameterTool":
        """Other's entries win on conflict (ParameterTool.mergeWith)."""
        merged = dict(self._data)
        merged.update(other._data)
        return ParameterTool(merged)
