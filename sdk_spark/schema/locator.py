"""JSON source locator: JSON pointer → (line, column) in the source text.

Schema-authoring errors are far more actionable with a source position than
with a bare pointer (reference capability: python/src/json_structure/
json_source_locator.py:10-68, 41 tests).  Re-implemented from scratch as a
single-pass recursive-descent scanner that records the byte offset of every
value (and object key) it passes, then resolves pointers via binary search
over precomputed line starts.

Positions are 1-based (line, column), matching editor conventions.
"""

from __future__ import annotations

import bisect


class JsonSourceError(ValueError):
    """The text is not syntactically valid JSON."""


_WS = " \t\r\n"


def _unescape_pointer_token(tok: str) -> str:
    return tok.replace("~1", "/").replace("~0", "~")


class SourceLocator:
    """Maps JSON pointers ('#/a/b/0' or '/a/b/0') to source positions.

    ``locate(ptr)`` → (line, col) of the VALUE the pointer addresses;
    ``locate_key(ptr)`` → position of the property KEY (for pointers whose
    last segment is an object member).  Both return None when the pointer
    does not resolve.
    """

    def __init__(self, text: str):
        self.text = text
        self._line_starts = [0]
        for i, ch in enumerate(text):
            if ch == "\n":
                self._line_starts.append(i + 1)
        self._value_at: dict[str, int] = {}
        self._key_at: dict[str, int] = {}
        self._pos = 0
        self._skip_ws()
        self._scan_value("")
        self._skip_ws()
        if self._pos != len(text):
            raise JsonSourceError(
                f"trailing content at offset {self._pos}")

    # -- public API -----------------------------------------------------------
    def locate(self, pointer: str) -> tuple[int, int] | None:
        off = self._value_at.get(self._norm(pointer))
        return None if off is None else self._to_line_col(off)

    def locate_key(self, pointer: str) -> tuple[int, int] | None:
        off = self._key_at.get(self._norm(pointer))
        return None if off is None else self._to_line_col(off)

    def pointers(self) -> list[str]:
        return sorted(self._value_at)

    # -- internals --------------------------------------------------------------
    @staticmethod
    def _norm(pointer: str) -> str:
        if pointer.startswith("#"):
            pointer = pointer[1:]
        return pointer

    def _to_line_col(self, offset: int) -> tuple[int, int]:
        line = bisect.bisect_right(self._line_starts, offset) - 1
        return line + 1, offset - self._line_starts[line] + 1

    def _skip_ws(self) -> None:
        t, n = self.text, len(self.text)
        while self._pos < n and t[self._pos] in _WS:
            self._pos += 1

    def _fail(self, msg: str) -> JsonSourceError:
        line, col = self._to_line_col(min(self._pos, len(self.text) - 1))
        return JsonSourceError(f"{msg} at line {line}, column {col}")

    def _scan_value(self, pointer: str) -> None:
        self._skip_ws()
        if self._pos >= len(self.text):
            raise self._fail("unexpected end of input")
        self._value_at[pointer] = self._pos
        ch = self.text[self._pos]
        if ch == "{":
            self._scan_object(pointer)
        elif ch == "[":
            self._scan_array(pointer)
        elif ch == '"':
            self._scan_string()
        elif ch in "-0123456789":
            self._scan_number()
        elif self.text.startswith("true", self._pos):
            self._pos += 4
        elif self.text.startswith("false", self._pos):
            self._pos += 5
        elif self.text.startswith("null", self._pos):
            self._pos += 4
        else:
            raise self._fail(f"unexpected character {ch!r}")

    def _scan_object(self, pointer: str) -> None:
        self._pos += 1  # '{'
        self._skip_ws()
        if self._pos < len(self.text) and self.text[self._pos] == "}":
            self._pos += 1
            return
        while True:
            self._skip_ws()
            if self._pos >= len(self.text) or self.text[self._pos] != '"':
                raise self._fail("expected object key")
            key_off = self._pos
            key = self._scan_string()
            child = f"{pointer}/{key.replace('~', '~0').replace('/', '~1')}"
            self._key_at[child] = key_off
            self._skip_ws()
            if self._pos >= len(self.text) or self.text[self._pos] != ":":
                raise self._fail("expected ':' after object key")
            self._pos += 1
            self._scan_value(child)
            self._skip_ws()
            if self._pos < len(self.text) and self.text[self._pos] == ",":
                self._pos += 1
                continue
            if self._pos < len(self.text) and self.text[self._pos] == "}":
                self._pos += 1
                return
            raise self._fail("expected ',' or '}' in object")

    def _scan_array(self, pointer: str) -> None:
        self._pos += 1  # '['
        self._skip_ws()
        if self._pos < len(self.text) and self.text[self._pos] == "]":
            self._pos += 1
            return
        idx = 0
        while True:
            self._scan_value(f"{pointer}/{idx}")
            idx += 1
            self._skip_ws()
            if self._pos < len(self.text) and self.text[self._pos] == ",":
                self._pos += 1
                continue
            if self._pos < len(self.text) and self.text[self._pos] == "]":
                self._pos += 1
                return
            raise self._fail("expected ',' or ']' in array")

    def _scan_string(self) -> str:
        # returns the DECODED string value (needed for pointer segments)
        t = self.text
        self._pos += 1  # opening quote
        out: list[str] = []
        while True:
            if self._pos >= len(t):
                raise self._fail("unterminated string")
            ch = t[self._pos]
            if ch == '"':
                self._pos += 1
                return "".join(out)
            if ch == "\\":
                if self._pos + 1 >= len(t):
                    raise self._fail("unterminated escape")
                esc = t[self._pos + 1]
                simple = {'"': '"', "\\": "\\", "/": "/", "b": "\b",
                          "f": "\f", "n": "\n", "r": "\r", "t": "\t"}
                if esc in simple:
                    out.append(simple[esc])
                    self._pos += 2
                elif esc == "u":
                    hex4 = t[self._pos + 2:self._pos + 6]
                    if len(hex4) != 4:
                        raise self._fail("bad \\u escape")
                    try:
                        out.append(chr(int(hex4, 16)))
                    except ValueError as exc:
                        raise self._fail("bad \\u escape") from exc
                    self._pos += 6
                else:
                    raise self._fail(f"bad escape \\{esc}")
            else:
                out.append(ch)
                self._pos += 1

    def _scan_number(self) -> None:
        t, n = self.text, len(self.text)
        while self._pos < n and t[self._pos] in "-+.eE0123456789":
            self._pos += 1


def locate_issues(text: str, issues: list) -> list[dict]:
    """Attach (line, col) to SchemaChecker issues whose path resolves in the
    source text. Returns [{code, message, path, line, col}, ...]."""
    try:
        loc = SourceLocator(text)
    except JsonSourceError:
        return [{"code": i.code, "message": i.message, "path": i.path,
                 "line": None, "col": None} for i in issues]
    out = []
    for i in issues:
        pos = loc.locate(i.path) or loc.locate_key(i.path)
        # walk up the pointer until something resolves (error paths may
        # address schema constructs, e.g. '#/properties/x/minimum')
        ptr = i.path
        while pos is None and "/" in ptr:
            ptr = ptr.rsplit("/", 1)[0]
            pos = loc.locate(ptr) or loc.locate_key(ptr)
        out.append({"code": i.code, "message": i.message, "path": i.path,
                    "line": pos[0] if pos else None,
                    "col": pos[1] if pos else None})
    return out
