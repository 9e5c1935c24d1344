"""Automaton protocol + the reference's automata, on a codepoint alphabet.

Mirrors Orchid-FST's single extension surface (reference:
/root/reference/src/main/fst/fst/fst_core/automaton.h:84-99 — the
``Start/IsMatch/CanMatch/Accept`` interface consumed by
``FstReader::GetIterator``) and its concrete automata:

- Always (automaton.h:307-325), Str (automaton.cpp:53-82),
  Prefix (automaton.cpp:185-213),
  GreaterThan / LessThan (automaton.h:354-419, automaton.cpp:85-181),
- combinators Intersect / Union / Not / StartsWith
  (automaton.h:104-304, factories automaton.cpp:40-51).

States are immutable Python values; ``accept`` is pure. A ``None``
state means the dead state (can never match).
"""

from __future__ import annotations

from typing import Any, Protocol

__all__ = [
    "Automaton", "AlwaysAutomaton", "StrAutomaton", "PrefixAutomaton",
    "GreaterThanAutomaton", "LessThanAutomaton", "IntersectAutomaton",
    "UnionAutomaton", "NotAutomaton", "StartsWithAutomaton",
]


class Automaton(Protocol):
    def start(self) -> Any: ...
    def is_match(self, state: Any) -> bool: ...
    def can_match(self, state: Any) -> bool: ...
    def accept(self, state: Any, ch: str) -> Any: ...


class AlwaysAutomaton:
    """Matches every string (reference automaton.h:307-325)."""

    def start(self):
        return True

    def is_match(self, state) -> bool:
        return True

    def can_match(self, state) -> bool:
        return True

    def accept(self, state, ch):
        return True


class StrAutomaton:
    """Matches exactly one string (reference automaton.cpp:53-82).

    State: number of chars matched so far, or None (dead).
    """

    def __init__(self, query: str) -> None:
        self.query = query

    def start(self):
        return 0

    def is_match(self, state) -> bool:
        return state is not None and state == len(self.query)

    def can_match(self, state) -> bool:
        return state is not None

    def accept(self, state, ch):
        if state is None or state >= len(self.query):
            return None
        return state + 1 if self.query[state] == ch else None


class PrefixAutomaton:
    """Matches strings starting with ``prefix`` (reference automaton.cpp:185-213).

    State: chars of the prefix consumed so far (saturating), None = dead.
    """

    def __init__(self, prefix: str) -> None:
        self.prefix = prefix

    def start(self):
        return 0

    def is_match(self, state) -> bool:
        return state is not None and state >= len(self.prefix)

    def can_match(self, state) -> bool:
        return state is not None

    def accept(self, state, ch):
        if state is None:
            return None
        if state >= len(self.prefix):
            return state  # already past the prefix: anything goes
        return state + 1 if self.prefix[state] == ch else None


class _OrderAutomaton:
    """Shared machinery for GreaterThan/LessThan over lexicographic order
    (reference automaton.h:354-419, automaton.cpp:85-181).

    State is one of:
      ("eq", k)  — current string equals bound[:k] (still on the boundary)
      "above"    — current string > bound (and not a bound prefix)
      "below"    — current string < bound and not a prefix of bound
    """

    def __init__(self, bound: str, inclusive: bool) -> None:
        self.bound = bound
        self.inclusive = inclusive

    def start(self):
        return ("eq", 0)

    def accept(self, state, ch):
        if state in ("above", "below"):
            return state
        if state is None:
            return None
        _, k = state
        if k >= len(self.bound):
            return "above"  # proper extension of the bound
        c = self.bound[k]
        if ch == c:
            return ("eq", k + 1)
        return "above" if ch > c else "below"


class GreaterThanAutomaton(_OrderAutomaton):
    def is_match(self, state) -> bool:
        if state is None or state == "below":
            return False
        if state == "above":
            return True
        _, k = state
        if k < len(self.bound):
            return False  # proper prefix of bound < bound
        return self.inclusive  # equals bound

    def can_match(self, state) -> bool:
        # below-branch strings can never recover; eq/above can
        return state is not None and state != "below"


class LessThanAutomaton(_OrderAutomaton):
    def is_match(self, state) -> bool:
        if state is None or state == "above":
            return False
        if state == "below":
            return True
        _, k = state
        if k < len(self.bound):
            return True  # proper prefix of bound < bound
        return self.inclusive  # equals bound

    def can_match(self, state) -> bool:
        if state is None or state == "above":
            return False
        return True


class IntersectAutomaton:
    """Product automaton: both must match (reference automaton.h:104-...)."""

    def __init__(self, a: Automaton, b: Automaton) -> None:
        self.a = a
        self.b = b

    def start(self):
        return (self.a.start(), self.b.start())

    def is_match(self, state) -> bool:
        return (state is not None and self.a.is_match(state[0])
                and self.b.is_match(state[1]))

    def can_match(self, state) -> bool:
        return (state is not None and self.a.can_match(state[0])
                and self.b.can_match(state[1]))

    def accept(self, state, ch):
        if state is None:
            return None
        sa = self.a.accept(state[0], ch)
        sb = self.b.accept(state[1], ch)
        return (sa, sb)


class UnionAutomaton:
    """Sum automaton: either matches."""

    def __init__(self, a: Automaton, b: Automaton) -> None:
        self.a = a
        self.b = b

    def start(self):
        return (self.a.start(), self.b.start())

    def is_match(self, state) -> bool:
        return state is not None and (self.a.is_match(state[0])
                                      or self.b.is_match(state[1]))

    def can_match(self, state) -> bool:
        return state is not None and (self.a.can_match(state[0])
                                      or self.b.can_match(state[1]))

    def accept(self, state, ch):
        if state is None:
            return None
        return (self.a.accept(state[0], ch), self.b.accept(state[1], ch))


class NotAutomaton:
    """Complement: matches strings the inner automaton does not.
    ``can_match`` is conservatively True (the complement of a
    non-universal language is live from every state)."""

    def __init__(self, inner: Automaton) -> None:
        self.inner = inner

    def start(self):
        return self.inner.start()

    def is_match(self, state) -> bool:
        return state is None or not self.inner.is_match(state)

    def can_match(self, state) -> bool:
        return True

    def accept(self, state, ch):
        if state is None:
            return None
        return self.inner.accept(state, ch)


class StartsWithAutomaton:
    """Matches any string with a prefix matched by the inner automaton
    (reference automaton.h StartsWithAutomation). State: ("done",) once
    a prefix has matched, else the inner state."""

    _DONE = ("done",)

    def __init__(self, inner: Automaton) -> None:
        self.inner = inner

    def start(self):
        s = self.inner.start()
        return self._DONE if self.inner.is_match(s) else s

    def is_match(self, state) -> bool:
        return state is self._DONE

    def can_match(self, state) -> bool:
        return state is self._DONE or (state is not None
                                       and self.inner.can_match(state))

    def accept(self, state, ch):
        if state is self._DONE:
            return state
        if state is None:
            return None
        s = self.inner.accept(state, ch)
        if s is not None and self.inner.is_match(s):
            return self._DONE
        return s
