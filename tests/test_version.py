"""Golden vectors for the dpkg version order.

Cases encode the reference's hard-won edge cases (FIXTURES.md §3;
common/version.go comments NVSHAS-4684 / NVSHAS-4818, sentinels, epochs).
"""

import random

import pytest

from vul_dbgen_spark.functions import version as V


def test_parse_basic():
    v = V.parse("2:svn28991.0-45.el7")
    assert v.epoch == 2
    assert v.version == "svn28991.0"
    assert v.revision == "45"
    assert v.el_ver == "el7"


def test_parse_no_revision_el():
    v = V.parse("1.2.3.el8")
    assert v.version == "1.2.3" and v.el_ver == "el8" and v.revision == ""


def test_parse_errors():
    for bad in ["", "  ", "x:1.0", "-1:1.0", "1:", "NA", "N/A", "1.0!bad"]:
        with pytest.raises(ValueError):
            V.parse(bad)
    assert V.parse_unsafe("NA") == V.ZERO_VERSION


@pytest.mark.parametrize(
    "a,b,expected",
    [
        # NVSHAS-4684: '.' beats '_' in el revisions
        ("2.9.1-6.el7.4", "2.9.1-6.el7_2.2", 1),
        ("2.9.1-6.el7_2.2", "2.9.1-6.el7.4", -1),
        # NVSHAS-4818: rc/pre sorts before release
        ("1.6_rc1-r0", "1.6-r1", -1),
        ("1.6-r1", "1.6_rc1-r0", 1),
        ("1.0_pre1", "1.0", -1),
        # tilde before everything
        ("1.0~beta1", "1.0", -1),
        ("1.0~~", "1.0~", -1),
        ("1.0~", "1.0", -1),
        # letters sort before non-letters; plain digit/letter ordering
        ("1.0a", "1.0+", -1),
        ("1.0", "1.0a", -1),
        ("1.2", "1.10", -1),
        ("1.02", "1.2", 0),
        # epoch dominates
        ("2:1.0", "1:9.9", 1),
        ("0:1.0", "1.0", 0),
        # revision compared after version
        ("1.0-2", "1.0-10", -1),
        ("1.0-1", "1.0", 1),
        # sentinels
        ("#MINV#", "0.0.0", -1),
        ("#MAXV#", "999999:999", 1),
        ("#MINV#", "#MAXV#", -1),
        ("#MINV#", "#MINV#", 0),
        # el_ver tail
        ("2.9.1-6.el7", "2.9.1-6.el8", -1),
        ("1.0-1.el7", "1.0-1", 1),
        # equal
        ("1.2.3-4.el9", "1.2.3-4.el9", 0),
    ],
)
def test_compare_golden(a, b, expected):
    assert V.compare(a, b) == expected


def _random_versions(n=400, seed=7):
    # NOTE: the reference comparator's rc/pre amendment is not transitive
    # (1.6_rc1 < 1.6 < 1.6_a < 1.6_rc1 is a cycle), so the random agreement
    # sweep excludes rc/pre parts; those are asserted as spot pairs below.
    rng = random.Random(seed)
    parts = ["1", "2", "10", "0", "3a", "beta", "~x", "2b", "el7", "el7_2"]
    seps = [".", "-", "_", "+", ""]
    out = []
    for _ in range(n):
        s = rng.choice(["", "1:", "2:"])
        s += rng.choice(["1", "2", "10"])
        for _ in range(rng.randint(0, 4)):
            s += rng.choice(seps) + rng.choice(parts)
        out.append(s)
    out += ["#MINV#", "#MAXV#", "2.9.1-6.el7.4", "2.9.1-6.el7_2.2"]
    return [v for v in out if V.parse_unsafe(v) != V.ZERO_VERSION]


def test_sort_key_agrees_with_compare():
    """The JVM-fast-path encoding must totally agree with the exact
    comparator on realistic version strings."""
    vs = _random_versions()
    mism = []
    for i in range(0, len(vs) - 1):
        for j in range(i + 1, min(i + 40, len(vs))):
            a, b = vs[i], vs[j]
            exact = V.compare(a, b)
            ka, kb = V.sort_key(a), V.sort_key(b)
            enc = (ka > kb) - (ka < kb)
            if exact != enc:
                mism.append((a, b, exact, enc))
    assert not mism, f"{len(mism)} divergences, first 5: {mism[:5]}"


@pytest.mark.parametrize(
    "a,b",
    [
        ("1.6_rc1-r0", "1.6-r1"),   # NVSHAS-4818 via separator
        ("1.6.rc1", "1.6"),
        ("1.0-rc2", "1.0"),
        ("1.6_pre3", "1.6"),
        ("1.6_rc1", "1.6_rc2"),
        ("1.6~rc1", "1.6"),
        ("2.9.1-6.el7.4", "2.9.1-6.el7_2.2"),  # NVSHAS-4684
    ],
)
def test_sort_key_agrees_on_amendment_goldens(a, b):
    exact = V.compare(a, b)
    ka, kb = V.sort_key(a), V.sort_key(b)
    assert ((ka > kb) - (ka < kb)) == exact


def test_sorted_order_spot():
    vs = ["1.0~beta1", "1.0", "1.0-1", "1.0-1.el7", "1.0a", "1.2", "1.10", "2:0.1", "#MAXV#"]
    shuffled = vs[::-1]
    assert sorted(shuffled, key=V.version_key) == vs
    assert sorted(shuffled, key=V.sort_key) == vs
