"""dpkg-style package-version total order.

Re-implements the reference's version semantics in Python (behavioral spec:
``/root/reference/common/version.go:38-315`` — deb-version / dpkg-1.17.25
``lib/version.c`` with two NeuVector-specific amendments):

- ``NewVersion`` parse: ``[epoch:]version[-revision][.el<ver>]`` where the
  ``.el`` split happens on the *last* ``.el`` of the revision (or of the
  version when there is no revision)                 (version.go:38-133).
- ``Compare``: epoch, then verrevcmp(version), verrevcmp(revision),
  verrevcmp(el_ver)                                   (version.go:148-184).
- verrevcmp char order: digits→0, letters→ord, '~'→-1, punct→ord+256
  (letters sort before punctuation, '~' before end-of-string)
                                                      (version.go:298-315).
- NVSHAS-4684: in a head-to-head of '.' vs '_' the '.' wins
  (``2.9.1-6.el7.4 > 2.9.1-6.el7_2.2``)               (version.go:248-253).
- NVSHAS-4818: an ``rc<digit>``/``pre<digit>`` tail sorts before release
  (``1.6_rc1-r0 < 1.6-r1``)                           (version.go:256-263).
- Sentinels ``#MINV#`` / ``#MAXV#`` sort first / last (version.go:24-26).

Two execution paths:

1. :func:`compare` — exact scalar comparator; exposed to Spark as Arrow
   pandas UDFs (:data:`version_cmp`, :data:`version_lt`, ...). This is the
   correctness path.
2. :func:`sort_key` — an order-preserving string encoding so joins, sorts
   and max-version aggregations stay JVM-side (native string ordering,
   whole-stage codegen). NOTE: the two NVSHAS amendments make the reference
   comparator NOT a total order (e.g. ``1.6_rc1 < 1.6 < 1.6_a < 1.6_rc1``
   is a cycle, and '.'>'_' cycles through ':'), so no sort key can agree
   with it on every pair. :func:`sort_key` defines the consistent total
   order that agrees with the reference on all its own golden cases
   (rc-vs-release, '.'-vs-'_' head-to-head, sentinels, epochs). Use the UDF
   comparator where pairwise bit-exactness vs the reference is required.
"""

from __future__ import annotations

import re
from functools import cmp_to_key
from typing import NamedTuple

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MINV = "#MINV#"
MAXV = "#MAXV#"

_RC_RE = re.compile(r"rc[0-9]|pre[0-9]")
_VERSION_OK = re.compile(r"^[0-9A-Za-z.\-+~:_]*$")
_REVISION_OK = re.compile(r"^[0-9A-Za-z.+~_]*$")


class Version(NamedTuple):
    epoch: int
    version: str
    revision: str
    el_ver: str

    def __str__(self) -> str:  # version.go:187-198
        s = f"{self.epoch}:" if self.epoch else ""
        s += self.version
        if self.revision:
            s += "-" + self.revision
        if self.el_ver:
            s += "." + self.el_ver
        return s


MIN_VERSION = Version(0, MINV, "", "")
MAX_VERSION = Version(0, MAXV, "", "")
ZERO_VERSION = Version(0, "", "", "")


def parse(s: str) -> Version:
    """Parse ``[epoch:]version[-revision][.el...]``; raises ValueError."""
    s = s.strip()
    if not s:
        raise ValueError("version string is empty")
    if s == MAXV:
        return MAX_VERSION
    if s == MINV:
        return MIN_VERSION

    epoch = 0
    sep = s.find(":")
    if sep > -1:
        try:
            epoch = int(s[:sep])
        except ValueError:
            raise ValueError("epoch in version is not a number") from None
        if epoch < 0:
            raise ValueError("epoch in version is negative")

    sep_rev = s.rfind("-")
    if sep_rev > -1:
        version, revision = s[sep + 1 : sep_rev], s[sep_rev + 1 :]
    else:
        version, revision = s[sep + 1 :], ""

    el_ver = ""
    target = revision if sep_rev > -1 else version
    el = target.rfind(".el")
    if el > -1:
        target, el_ver = target[:el], target[el + 1 :]
    if sep_rev > -1:
        revision = target
    else:
        version = target

    if not version:
        raise ValueError("no version")
    if not _VERSION_OK.match(version):
        raise ValueError("invalid character in version")
    if not _REVISION_OK.match(revision) or not _REVISION_OK.match(el_ver):
        raise ValueError("invalid character in revision")
    if s in ("NA", "N/A"):
        raise ValueError("version is not available")
    return Version(epoch, version, revision, el_ver)


def parse_unsafe(s: str) -> Version:
    """Like parse() but maps errors to the zero version (NewVersionUnsafe)."""
    try:
        return parse(s)
    except (ValueError, TypeError):
        return ZERO_VERSION


def _order(c: str) -> int:
    if "0" <= c <= "9":
        return 0
    if ("a" <= c <= "z") or ("A" <= c <= "Z"):
        return ord(c)
    if c == "~":
        return -1
    return ord(c) + 256


def _verrevcmp(t1: str, t2: str) -> int:
    i, j, n1, n2 = 0, 0, len(t1), len(t2)
    while i < n1 or j < n2:
        first_diff = 0
        while (i < n1 and not t1[i].isdigit()) or (j < n2 and not t2[j].isdigit()):
            ac = _order(t1[i]) if i < n1 else 0
            bc = _order(t2[j]) if j < n2 else 0
            # NVSHAS-4684: '.' beats '_' head-to-head
            if ac == 302 and bc == 351:
                return 1
            if ac == 351 and bc == 302:
                return -1
            if ac != bc:
                # NVSHAS-4818: rc/pre tail sorts before release
                if ac > bc and bc == 0 and _RC_RE.search(t1[i + 1 :]):
                    return -1
                if ac < bc and ac == 0 and _RC_RE.search(t2[j + 1 :]):
                    return 1
                return ac - bc
            i += 1
            j += 1
        while i < n1 and t1[i] == "0":
            i += 1
        while j < n2 and t2[j] == "0":
            j += 1
        while i < n1 and t1[i].isdigit() and j < n2 and t2[j].isdigit():
            if first_diff == 0:
                first_diff = ord(t1[i]) - ord(t2[j])
            i += 1
            j += 1
        if i < n1 and t1[i].isdigit():
            return 1
        if j < n2 and t2[j].isdigit():
            return -1
        if first_diff:
            return first_diff
    return 0


def _sign(x: int) -> int:
    return (x > 0) - (x < 0)


def compare_parsed(a: Version, b: Version) -> int:
    if a == b:
        return 0
    if a == MIN_VERSION or b == MAX_VERSION:
        return -1
    if b == MIN_VERSION or a == MAX_VERSION:
        return 1
    if a.epoch != b.epoch:
        return 1 if a.epoch > b.epoch else -1
    rc = _verrevcmp(a.version, b.version)
    if rc:
        return _sign(rc)
    rc = _verrevcmp(a.revision, b.revision)
    if rc:
        return _sign(rc)
    return _sign(_verrevcmp(a.el_ver, b.el_ver))


def compare(a: str, b: str) -> int:
    """Exact dpkg compare of two version strings; -1/0/+1."""
    return compare_parsed(parse_unsafe(a), parse_unsafe(b))


version_key = cmp_to_key(compare)  # for Python-side sorted()


# ---------------------------------------------------------------------------
# Order-preserving string encoding (JVM-native fast path)
# ---------------------------------------------------------------------------

# byte alphabet (dpkg phase order: '~' < end-of-run/zero-run <
# non-zero-digit-run < letters < punctuation):
#   \x01        = '~'
#   \x02        = end-of-run / segment separator / all-zero digit run
#   'A'..'z'    = letters (identity)
#   \x03 + 4-digit length + digits = non-zero digit run (numeric compare;
#                 beats end-of-run but loses to letters/punct, because in
#                 dpkg's char phase a digit has order 0)
#   \x7f + rank = punctuation (order = ord+256 > letters), with '_'
#                 re-ranked just below '.' (NVSHAS-4684 head-to-head)
_SEG_SEP = "\x02"
_NUM_MARK = "\x03"


def _punct_rank_table() -> dict[str, str]:
    puncts = [chr(c) for c in range(33, 127) if not chr(c).isalnum() and chr(c) != "~"]
    puncts.sort(key=ord)  # Go order = ord+256, monotone in ord
    puncts.remove("_")
    puncts.insert(puncts.index("."), "_")
    return {c: chr(0x20 + i) for i, c in enumerate(puncts)}


_PUNCT_RANK = _punct_rank_table()


def _encode_run_text(run: str) -> str:
    out = []
    for c in run:
        if c == "~":
            out.append("\x01")
        elif c.isalnum():
            out.append(c)
        else:
            out.append("\x7f" + _PUNCT_RANK.get(c, c))
    return "".join(out)


_TOKEN_RE = re.compile(r"\d+|\D+")
# rewrite "...<sep>rcN" → "...~rcN": the comparator's NVSHAS-4818
# amendment is not a total order on arbitrary inputs (it can cycle, see
# the note in tests/test_version.py), so no key can agree with it
# everywhere; key space encodes the separator-adjacent rc/pre forms —
# the ones real feeds contain, pinned as spot pairs — as plain tilde
# ordering, and tests/test_props.py verifies key↔comparator agreement
# on the rc/pre-free grammar.
_RC_NORM_RE = re.compile(r"[._+\-]((?:rc|pre)[0-9])")


def _encode_component(comp: str) -> str:
    comp = _RC_NORM_RE.sub(r"~\1", comp)
    toks = _TOKEN_RE.findall(comp)
    out = []
    for i, tok in enumerate(toks):
        if tok[0].isdigit():
            d = tok.lstrip("0")
            if d:
                # non-zero runs compare numerically via (length, digits)
                out.append(f"{_NUM_MARK}{min(len(d), 9999):04d}{d}")
            elif i + 1 < len(toks):
                # zero run mid-string acts like end-of-run (order 0)
                out.append(_SEG_SEP)
            # trailing all-zero run vanishes ("1.0-0" == "1.0-")
        else:
            out.append(_encode_run_text(tok) + _SEG_SEP)
    return "".join(out)


def sort_key(s: str | None) -> str:
    """Order-preserving encoding: native string '<' == dpkg '<'."""
    if s is None:
        return ""
    v = parse_unsafe(s)
    if v == MIN_VERSION:
        return "\x00"
    if v == MAX_VERSION:
        return "\xff\xff"
    return (
        f"{v.epoch:010d}"
        + _SEG_SEP
        + _encode_component(v.version)
        + _SEG_SEP
        + _encode_component(v.revision)
        + _SEG_SEP
        + _encode_component(v.el_ver)
    )


# ---------------------------------------------------------------------------
# Spark surface (Arrow-vectorized pandas UDFs)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.IntegerType())
def version_cmp(a: pd.Series, b: pd.Series) -> pd.Series:
    """-1/0/+1 dpkg comparison of two version-string columns."""
    return pd.Series(
        [compare(x or "", y or "") for x, y in zip(a, b)], dtype="int32"
    )


@F.pandas_udf(T.StringType())
def version_sort_key(s: pd.Series) -> pd.Series:
    """Order-preserving sortable key; use for ORDER BY / max_by on versions."""
    return s.map(sort_key, na_action=None).fillna("")


def version_lt(a, b):
    return version_cmp(a, b) < 0


def version_lte(a, b):
    return version_cmp(a, b) <= 0


def version_gt(a, b):
    return version_cmp(a, b) > 0


def version_gte(a, b):
    return version_cmp(a, b) >= 0
