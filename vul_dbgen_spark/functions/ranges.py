"""The opcode version-range mini-language.

A range expression is an ordered list of ``{op_code, version}`` terms where
``op_code`` is one of ``"", eq, lt, lteq, gt, gteq`` optionally prefixed by
``or``/``and``. Terms chain left-to-right: an ``or``-prefixed term opens a
new OR group, everything else ANDs into the current group —
``[gteq a, andlt b, orgteq c, andlt d]`` ⇒ ``(>=a ∧ <b) ∨ (>=c ∧ <d)``.

Behavioral specs in the reference:
- NVD CPE-range strings → one term: ``parseAffectedVersion``
  (``updater/updater.go:224-245``).
- GHSA ``vulnerableVersionRange`` strings → term list: ``getVersion``
  (``updater/fetchers/apps/ghsa.go:203-235``).
- OSV SEMVER/ECOSYSTEM events → term list: ``parseAffectedRanges``
  (``updater/fetchers/apps/govuln.go:205-328``).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .version import compare


class Term(NamedTuple):
    op_code: str
    version: str

    def as_dict(self) -> dict:
        return {"op_code": self.op_code, "version": self.version}


def parse_affected_version(s: str) -> Term:
    """One NVD-style range string → one term (updater.go:224-245).

    ``"||"`` anywhere → ``or`` prefix; ``<``/``>`` → lt/gt; ``=`` appends
    ``eq``; the operator characters are stripped from the left.
    """
    vo = ""
    if "||" in s:
        vo += "or"
        s = s.lstrip("|")
    if "<" in s:
        vo += "lt"
        s = s.lstrip("<")
    elif ">" in s:
        vo += "gt"
        s = s.lstrip(">")
    if "=" in s:
        vo += "eq"
        s = s.lstrip("=")
    return Term(vo, s)


_GHSA_VERSION_RE = re.compile(r"([><=|\s]*)([0-9A-Za-z.\-]+)")


def get_version(s: str) -> list[Term]:
    """GHSA range string → term list (ghsa.go:203-235).

    e.g. ``">= 1.3.0, < 1.3.2 || >= 1.4.0"`` →
    ``[gteq 1.3.0, lt 1.3.2, orgteq 1.4.0]``; a leading ``v`` is dropped.
    """
    out: list[Term] = []
    for m in _GHSA_VERSION_RE.finditer(s):
        whole, ops, vv = m.group(0), m.group(1), m.group(2)
        vo = ""
        if "||" in whole:
            vo = "or"
        if "<" in ops:
            vo += "lt"
        elif ">" in ops:
            vo += "gt"
        if "=" in ops:
            vo += "eq"
        if vv.startswith("v"):
            vv = vv.replace("v", "", 1)
        if vo or vv:
            out.append(Term(vo, vv))
    return out


def osv_ranges(
    events: list[dict],
    affected: list[Term] | None = None,
    fixed: list[Term] | None = None,
    *,
    intro_op: str | None = None,
    zero_wrap: bool = False,
) -> tuple[list[Term], list[Term]]:
    """One OSV range's events → (affected_terms, fixed_terms).

    Mirrors ``parseAffectedRanges`` (govuln.go:205-328). ``introduced``
    opens a group (``gteq``/``orgteq``), a following ``introduced`` closes
    the current group with ``andlt``, ``fixed`` closes with ``andlt`` and
    emits a ``gteq`` fixed term. The two call sites differ (golden:
    govuln_test.go:53-236):

    - ECOSYSTEM custom ranges: the or-opcode is recomputed per event
      (``intro_op=None``), no zero-wrap.
    - SEMVER ranges: the or-opcode is fixed at entry (pass it via
      ``intro_op``), and a trailing lone ``introduced "0"`` wraps back to
      the first term's version (``zero_wrap=True``).
    """
    aff = list(affected) if affected else []
    fix = list(fixed) if fixed else []
    n = len(events)
    for i, ev in enumerate(events):
        introduced = ev.get("introduced") or ""
        fixed_v = ev.get("fixed") or ""
        if introduced:
            op = intro_op if intro_op else ("orgteq" if aff else "gteq")
            aff.append(Term(op, introduced))
            nxt = events[i + 1].get("introduced") or "" if i + 1 < n else ""
            if nxt:
                aff.append(Term("andlt", nxt))
            elif zero_wrap and i + 1 >= n and introduced == "0" and len(aff) > 1:
                aff.append(Term("andlt", aff[0].version))
        if fixed_v:
            aff.append(Term("andlt", fixed_v))
            fix.append(Term("gteq", fixed_v))
    return aff, fix


def osv_affected_ranges(
    custom_ranges: list[dict] | None, semver_ranges: list[dict] | None
) -> tuple[list[Term], list[Term]]:
    """Full parseAffectedRanges: ECOSYSTEM custom ranges first, then SEMVER
    ranges (govuln.go:226-328). Each element is ``{"type": ..., "events":
    [{"introduced"/"fixed": v}, ...]}``; wrong-typed ranges are skipped."""
    aff: list[Term] = []
    fix: list[Term] = []
    for r in custom_ranges or []:
        if r.get("type") != "ECOSYSTEM":
            continue
        aff, fix = osv_ranges(r.get("events") or [], aff, fix)
    # SEMVER opcode is decided once, before the range loop (govuln.go:279-283)
    semver_op = "orgteq" if aff else "gteq"
    for r in semver_ranges or []:
        if r.get("type") != "SEMVER":
            continue
        aff, fix = osv_ranges(
            r.get("events") or [], aff, fix, intro_op=semver_op, zero_wrap=True
        )
    return aff, fix


# ---------------------------------------------------------------------------
# Ruby pessimistic-operator ("~>") expressions (ruby.go:222-315)
# ---------------------------------------------------------------------------

_RUBY_V1 = re.compile(r"~> ([0-9a-zA-Z.]+), >= ([0-9a-zA-Z.]+)")
_RUBY_V2 = re.compile(r"([<>=]+) ([0-9a-zA-Z.]+), ([<>=]+) ([0-9a-zA-Z.]+)")
_RUBY_V3 = re.compile(r"~> ([0-9a-zA-Z.]+)")
_RUBY_V4 = re.compile(r"([<>=]+) ([0-9a-zA-Z.]+)")


def get_operation(op: str, rev: bool) -> str:
    """Gem operator → opcode, optionally inverted (ruby.go:222-250)."""
    table = {">=": ("gteq", "lt"), ">": ("gt", "lteq"), "<=": ("lteq", "gt"), "<": ("lt", "gteq")}
    if op in table:
        return table[op][1 if rev else 0]
    return "eq"


def parse_ruby_version(i: int, pv: str, rev: bool) -> list[Term] | None:
    """One gem requirement string → term list (ruby.go:261-305).

    ``i > 0`` prefixes the first term with ``or``; ``rev`` inverts the
    operators (used to derive affected from patched). The ``~> X.Y.Z``
    pessimistic form carries a ``,prefix`` branch qualifier built from the
    first two version numbers.
    """
    pre = "or" if i > 0 else ""
    if m := _RUBY_V1.search(pv):
        ver = m.group(2)
        s = m.group(1).split(".")
        ver += "," + (m.group(1) if len(s) <= 2 else ".".join(s[:2]))
        return [Term(pre + get_operation(">=", rev), ver)]
    if m := _RUBY_V2.search(pv):
        return [
            Term(pre + get_operation(m.group(1), rev), m.group(2)),
            Term(get_operation(m.group(3), rev), m.group(4)),
        ]
    if m := _RUBY_V3.search(pv):
        s = m.group(1).split(".")
        ver = m.group(1)
        ver += "," + (".".join(s[: len(s) - 1]) if len(s) <= 2 else ".".join(s[:2]))
        return [Term(pre + get_operation(">=", rev), ver)]
    if m := _RUBY_V4.search(pv):
        return [Term(pre + get_operation(m.group(1), rev), m.group(2))]
    return None


def _ruby_sort_key(s: str) -> str:
    # sort.Slice on the string left-trimmed of non-alphanumerics
    # (ruby.go:180-197)
    i = 0
    while i < len(s) and not s[i].isalnum():
        i += 1
    return s[i:]


def ruby_ranges(
    patched: list[str], unaffected: list[str]
) -> tuple[list[Term], list[Term], list[Term]] | None:
    """(affected, fixed, unaffected) terms from gem requirement lists
    (rubyVulToModule, ruby.go:170-220). Returns None when both inputs are
    empty (record skipped)."""
    patched = sorted(patched, key=_ruby_sort_key)
    unaffected = sorted(unaffected, key=_ruby_sort_key)
    fixed: list[Term] = []
    unaff: list[Term] = []
    for k, pv in enumerate(patched):
        if terms := parse_ruby_version(k, pv, False):
            fixed.extend(terms)
    for k, pv in enumerate(unaffected):
        if terms := parse_ruby_version(k, pv, False):
            # note: ruby.go:206-208 "or"-prefixes mver[0] AFTER append —
            # Go append copies value structs, so that mutation never
            # reaches UnaffectedVer; terms are stored as parsed
            unaff.extend(terms)
    if not patched and not unaffected:
        return None
    affected: list[Term] = []
    for k, pv in enumerate(patched):
        if terms := parse_ruby_version(k, pv, True):
            affected.extend(terms)
    return affected, fixed, unaff


# ---------------------------------------------------------------------------
# Evaluation (the scanner-side semantics, exposed as a query operator)
# ---------------------------------------------------------------------------

_BASE_OPS = ("lteq", "gteq", "lt", "gt", "eq")


def _split_term_op(op_code: str) -> tuple[bool, str]:
    """→ (starts_new_or_group, base_op)."""
    op = op_code or ""
    new_group = op.startswith("or")
    if new_group:
        op = op[2:]
    if op.startswith("and"):
        op = op[3:]
    return new_group, op


def _eval_term(version: str, term_op: str, term_version: str) -> bool:
    # openshift-style ",branch" qualifier: compare against the version part
    tv = term_version.split(",")[0] if "," in term_version else term_version
    c = compare(version, tv)
    if term_op == "lt":
        return c < 0
    if term_op == "lteq":
        return c <= 0
    if term_op == "gt":
        return c > 0
    if term_op == "gteq":
        return c >= 0
    # "" and "eq" both mean exact match
    return c == 0


def matches_ranges(version: str, terms: list) -> bool:
    """Evaluate the or/and term chain against a version string."""
    if not terms:
        return False
    group_ok = True
    any_group = False
    started = False
    for t in terms:
        if isinstance(t, dict):
            op_code, tver = t.get("op_code", ""), t.get("version", "")
        else:
            op_code, tver = t[0], t[1]
        new_group, base = _split_term_op(op_code)
        if new_group and started:
            any_group = any_group or group_ok
            group_ok = True
        started = True
        group_ok = group_ok and _eval_term(version, base, tver)
    return any_group or group_ok
