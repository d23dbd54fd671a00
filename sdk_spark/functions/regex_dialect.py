"""Java↔Python regex dialect guard for `pattern` lowering.

The reference validator evaluates ``pattern`` with Python ``re.search``
(reference: python/src/json_structure/instance_validator.py:904-910).
Spark's ``rlike`` uses ``java.util.regex`` — a different dialect: Python
named groups ``(?P<x>)``, group backrefs ``(?P=x)``, conditional groups
``(?(1)...)`` either fail to compile mid-job on the executors or silently
change meaning, and ``\\Z`` anchors one position earlier in Java than in
Python.  ``java_safe`` decides AT COMPILE TIME whether a pattern may be
handed to ``rlike`` with reference semantics; callers route unsafe patterns
to the Arrow-batched Python fallback (``python_regex_match``) instead.
"""

import re
import warnings

import pandas as pd

# Construct prefixes that exist in Python `re` but not (or not with the
# same meaning) in java.util.regex. Scanned outside character classes with
# escape tracking, not naive substring search.
_PY_ONLY_GROUPS = ("(?P<", "(?P=", "(?(")
# Inline flags Java lacks: (?a) ASCII, (?L) locale, (?u) differs subtly but
# Java accepts it; reject the two that Java rejects outright.
_PY_ONLY_FLAGS = ("a", "L")


def _scan_tokens(pattern: str):
    """Yield (index, char, escaped, in_class) for each char of the pattern."""
    escaped = False
    in_class = False
    for i, ch in enumerate(pattern):
        yield i, ch, escaped, in_class
        if escaped:
            escaped = False
        elif ch == "\\":
            escaped = True
        elif ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False


def python_compile(pattern: str) -> "re.Pattern":
    """Compile under the reference dialect; raises ``re.error`` if invalid.

    Patterns like ``[[...]]`` make CPython warn that nested-set/set-
    intersection semantics may change in a future release; today they
    compile as literals, so the probe suppresses the FutureWarning here
    (a single compile-time site) rather than letting every executor log
    it — and ``java_safe`` independently routes such patterns to the
    Python fallback so a future semantic change cannot silently diverge
    between engines."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        return re.compile(pattern)


def java_safe(pattern: str) -> bool:
    """True when handing ``pattern`` to ``rlike`` preserves Python-`re`
    semantics for the search() use the reference makes of it.

    Conservative: a False only costs one Arrow-batched fallback expression;
    a wrong True silently diverges from the reference on the executors.
    """
    try:
        python_compile(pattern)
    except re.error:
        return False  # caller turns this into a schema compile error
    for i, ch, escaped, in_class in _scan_tokens(pattern):
        if escaped and not in_class:
            # \Z: Python = absolute end; Java \Z = before final terminator
            if ch == "Z":
                return False
        if in_class and not escaped:
            # Java gives `&&` (intersection) and a nested `[` (class union)
            # special meaning INSIDE a character class; Python treats both
            # literally — the pattern compiles in both dialects but matches
            # differently, so the compile gate below can't catch it.
            if ch == "[" or (ch == "&" and pattern[i:i + 2] == "&&"):
                return False
        if ch == "(" and not escaped and not in_class:
            rest = pattern[i:]
            if any(rest.startswith(g) for g in _PY_ONLY_GROUPS):
                return False
            # plain, scoped, and negated inline-flag forms: (?ai), (?a:x),
            # (?a-i:x), (?-i:x) — Python-only flags may only appear in the
            # positive half (negating 'a'/'L' is a Python syntax error)
            m = re.match(r"\(\?([aiLmsux]*)(?:-[imsx]+)?[):]", rest)
            if m and any(f in m.group(1) for f in _PY_ONLY_FLAGS):
                return False
    # group backreferences \1..\9: Java supports them, but Python and Java
    # disagree on forward/nested-ref edge cases; keep them on the Python path
    for i, ch, escaped, in_class in _scan_tokens(pattern):
        if escaped and ch.isdigit() and not in_class:
            return False
    # final gate: it must actually compile under java.util.regex when a JVM
    # is reachable (an executor-side PatternSyntaxException kills the job)
    return _java_compiles(pattern)


def _java_compiles(pattern: str) -> bool:
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            # No JVM to ask → NOT safe.  The marker scan is necessary but
            # not sufficient (Java rejects constructs Python accepts, e.g.
            # dangling `]`); a wrong True here becomes an executor-side
            # PatternSyntaxException mid-job, while a wrong False only
            # costs the Arrow fallback for plans compiled session-less.
            return False
        spark._jvm.java.util.regex.Pattern.compile(pattern)
        return True
    except Exception:
        return False


def python_regex_match(col, pattern: str):
    """Arrow-batched unanchored Python-`re` search as a boolean Column.

    Used only for the (rare) Python-dialect patterns ``java_safe`` rejects;
    everything else stays JVM-side in ``rlike``. NULL input → NULL (the
    compiler's ``_present`` wrapper supplies absent-is-ok semantics).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _search(s: pd.Series) -> pd.Series:
        rx = re.compile(pattern)
        return s.map(lambda x: None if x is None
                     else rx.search(x) is not None)

    return _search(col)
