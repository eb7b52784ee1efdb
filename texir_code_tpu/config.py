"""HOCON-subset config system.

The reference drives every stage from pyhocon HOCON files (reference
trainer/train_material.py:36, configs/*.conf) and resolves model/dataset/loss
classes from dotted-path strings (reference utils/general.py:12-18).  pyhocon
is not available in this image, so this module implements the subset of HOCON
the reference configs actually use:

  * nested ``key { ... }`` blocks
  * ``key = value`` assignments (also ``key: value``)
  * scalars (int/float/bool/string, bare or quoted), lists ``[a, b]``
  * ``#`` and ``//`` comments
  * dotted-path lookups with pyhocon-compatible accessors
    (get_string/get_int/get_float/get_bool/get_list/get_config)

so the reference's .conf files parse unmodified.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional


class Config:
    """A nested dict with pyhocon-style dotted-path accessors."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        self._data: Dict[str, Any] = data if data is not None else {}

    # -- lookup ------------------------------------------------------------
    _MISSING = object()

    def _resolve(self, path: str, default: Any = _MISSING) -> Any:
        node: Any = self._data
        for part in path.split("."):
            if isinstance(node, Config):
                node = node._data
            if not isinstance(node, dict) or part not in node:
                if default is Config._MISSING:
                    raise KeyError(f"config path not found: {path!r}")
                return default
            node = node[part]
        return node

    def get(self, path: str, default: Any = None) -> Any:
        val = self._resolve(path, default)
        if isinstance(val, dict):
            return Config(val)
        return val

    def __contains__(self, path: str) -> bool:
        return self._resolve(path, None) is not None

    def get_string(self, path: str, default: Any = _MISSING) -> str:
        return str(self._resolve(path, default))

    def get_int(self, path: str, default: Any = _MISSING) -> int:
        return int(self._resolve(path, default))

    def get_float(self, path: str, default: Any = _MISSING) -> float:
        return float(self._resolve(path, default))

    def get_bool(self, path: str, default: Any = _MISSING) -> bool:
        val = self._resolve(path, default)
        if isinstance(val, str):
            return val.strip().lower() in ("true", "yes", "on", "1")
        return bool(val)

    def get_list(self, path: str, default: Any = _MISSING) -> List[Any]:
        val = self._resolve(path, default)
        return list(val) if val is not None else val

    def get_config(self, path: str, default: Any = _MISSING) -> "Config":
        val = self._resolve(path, default)
        if val is None or isinstance(val, Config):
            return val
        if not isinstance(val, dict):
            raise TypeError(f"config path {path!r} is not a block: {val!r}")
        return Config(val)

    def as_dict(self) -> Dict[str, Any]:
        def conv(v):
            if isinstance(v, Config):
                return conv(v._data)
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(self._data)

    def put(self, path: str, value: Any) -> None:
        """Set a dotted-path value (creating intermediate blocks)."""
        parts = path.split(".")
        node = self._data
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def __repr__(self) -> str:
        return f"Config({self._data!r})"


_BARE_TRUE = {"true", "yes", "on"}
_BARE_FALSE = {"false", "no", "off"}


def _parse_scalar(tok: str) -> Any:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "\"'":
        return tok[1:-1]
    low = tok.lower()
    if low in _BARE_TRUE:
        return True
    if low in _BARE_FALSE:
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


def _strip_comment(line: str) -> str:
    # strip # / // comments outside of quotes
    out = []
    in_q: Optional[str] = None
    i = 0
    while i < len(line):
        ch = line[i]
        if in_q:
            if ch == in_q:
                in_q = None
            out.append(ch)
        else:
            if ch in "\"'":
                in_q = ch
                out.append(ch)
            elif ch == "#":
                break
            elif ch == "/" and i + 1 < len(line) and line[i + 1] == "/":
                break
            else:
                out.append(ch)
        i += 1
    return "".join(out)


def _parse_value(text: str) -> Any:
    text = text.strip()
    if text.startswith("["):
        inner = text[1:-1] if text.endswith("]") else text[1:]
        items = [t for t in (s.strip() for s in _split_list(inner)) if t]
        return [_parse_value(t) for t in items]
    return _parse_scalar(text)


def _split_list(inner: str) -> List[str]:
    """Split a list body on commas, respecting nested brackets/quotes."""
    items, depth, in_q, cur = [], 0, None, []
    for ch in inner:
        if in_q:
            cur.append(ch)
            if ch == in_q:
                in_q = None
        elif ch in "\"'":
            in_q = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        items.append("".join(cur))
    return items


_KEY_RE = re.compile(r"^\s*([A-Za-z0-9_.\-]+)\s*(=|:)?\s*(.*)$")


def parse_string(text: str) -> Config:
    """Parse a HOCON-subset document into a Config."""
    root: Dict[str, Any] = {}
    stack: List[Dict[str, Any]] = [root]
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = _strip_comment(lines[i]).strip()
        i += 1
        if not line:
            continue
        # closing brace(s), possibly alone on a line
        while line.startswith("}"):
            stack.pop()
            line = line[1:].strip()
        if not line:
            continue
        m = _KEY_RE.match(line)
        if m is None:
            if line == "{":
                continue
            raise ValueError(f"cannot parse config line: {line!r}")
        key, _sep, rest = m.group(1), m.group(2), m.group(3).strip()
        if rest.startswith("{") or (not rest and _peek_open_brace(lines, i)):
            block: Dict[str, Any] = stack[-1].setdefault(key, {})
            stack.append(block)
            if rest.startswith("{"):
                rest = rest[1:].strip()
                if rest.endswith("}"):  # inline empty/one-line block
                    body = rest[:-1].strip()
                    if body:
                        bm = _KEY_RE.match(body)
                        if bm:
                            block[bm.group(1)] = _parse_value(bm.group(3))
                    stack.pop()
            else:
                # brace on the following line; consume it
                while i < len(lines) and not _strip_comment(lines[i]).strip():
                    i += 1
                i += 1  # skip the '{' line
            continue
        # multi-line list: accumulate until brackets balance
        if rest.startswith("[") and rest.count("[") > rest.count("]"):
            buf = [rest]
            while i < len(lines):
                nxt = _strip_comment(lines[i]).strip()
                i += 1
                buf.append(nxt)
                if "".join(buf).count("[") <= "".join(buf).count("]"):
                    break
            rest = " ".join(buf)
        # strip trailing close-brace on same line ("key = v }")
        closes = 0
        while rest.endswith("}"):
            rest = rest[:-1].rstrip()
            closes += 1
        stack[-1][key] = _parse_value(rest)
        for _ in range(closes):
            stack.pop()
    return Config(root)


def _peek_open_brace(lines: List[str], i: int) -> bool:
    while i < len(lines):
        s = _strip_comment(lines[i]).strip()
        if s:
            return s.startswith("{")
        i += 1
    return False


def parse_file(path: str) -> Config:
    with open(path, "r") as f:
        return parse_string(f.read())


# pyhocon-compatible alias so call sites read like the reference
class ConfigFactory:
    parse_file = staticmethod(parse_file)
    parse_string = staticmethod(parse_string)
