"""Golden vectors for the opcode range mini-language (FIXTURES.md §3)."""

from vul_dbgen_spark.functions import ranges as R


def test_parse_affected_version():
    assert R.parse_affected_version(">=1.0") == ("gteq", "1.0")
    assert R.parse_affected_version("<2.0") == ("lt", "2.0")
    assert R.parse_affected_version("||<2.0") == ("orlt", "2.0")
    assert R.parse_affected_version("=1.5") == ("eq", "1.5")
    assert R.parse_affected_version("1.5") == ("", "1.5")


def test_get_version_ghsa():
    terms = R.get_version(">= 1.3.0, < 1.3.2")
    assert terms == [("gteq", "1.3.0"), ("lt", "1.3.2")]
    terms = R.get_version(">=1.3.0 <1.3.2 || >=1.4.0 <1.4.11")
    assert terms == [
        ("gteq", "1.3.0"),
        ("lt", "1.3.2"),
        ("orgteq", "1.4.0"),
        ("lt", "1.4.11"),
    ]
    assert R.get_version("v1.2.3") == [("", "1.2.3")]


def test_osv_custom_ranges_multiple_or_groups():
    """govuln_test.go 'CustomRanges_MultipleOrGroups': ECOSYSTEM events
    recompute the or-opcode per event; trailing SEMVER introduced-0 wraps."""
    custom = [
        {
            "type": "ECOSYSTEM",
            "events": [
                {"introduced": "5.2.0"},
                {"fixed": "5.3.0"},
                {"introduced": "5.3.0"},
                {"fixed": "5.3.4"},
                {"introduced": "5.4.0"},
                {"fixed": "5.4.7"},
            ],
        }
    ]
    semver = [{"type": "SEMVER", "events": [{"introduced": "0"}]}]
    aff, fix = R.osv_affected_ranges(custom, semver)
    assert [(t.op_code, t.version) for t in aff] == [
        ("gteq", "5.2.0"),
        ("andlt", "5.3.0"),
        ("orgteq", "5.3.0"),
        ("andlt", "5.3.4"),
        ("orgteq", "5.4.0"),
        ("andlt", "5.4.7"),
        ("orgteq", "0"),
        ("andlt", "5.2.0"),
    ]
    assert [(t.op_code, t.version) for t in fix] == [
        ("gteq", "5.3.0"),
        ("gteq", "5.3.4"),
        ("gteq", "5.4.7"),
    ]


def test_osv_semver_only():
    """govuln_test.go 'SemverOnly_ZeroIntroduced' + 'IntroducedAndFixed':
    SEMVER-only conversions with the entry-time opcode."""
    aff, fix = R.osv_affected_ranges(
        None, [{"type": "SEMVER", "events": [{"introduced": "0"}]}]
    )
    assert [(t.op_code, t.version) for t in aff] == [("gteq", "0")]
    assert fix == []

    aff, fix = R.osv_affected_ranges(
        None,
        [{"type": "SEMVER", "events": [{"introduced": "1.0.0"}, {"fixed": "1.2.3"}]}],
    )
    assert [(t.op_code, t.version) for t in aff] == [
        ("gteq", "1.0.0"),
        ("andlt", "1.2.3"),
    ]
    assert [(t.op_code, t.version) for t in fix] == [("gteq", "1.2.3")]

    # SEMVER after custom ranges: all introduced use orgteq, incl. zero-wrap
    custom = [
        {
            "type": "ECOSYSTEM",
            "events": [
                {"introduced": "0.0.0-20230727023453-1c4957d53911"},
                {"fixed": "0.0.0-20251020133207-084a437033b4"},
                {"introduced": "5.2.0"},
                {"fixed": "5.3.0"},
                {"introduced": "5.3.0"},
                {"fixed": "5.3.5"},
            ],
        }
    ]
    semver = [
        {
            "type": "SEMVER",
            "events": [{"introduced": "0"}, {"introduced": "1.0.0"}, {"fixed": "1.2.3"}],
        }
    ]
    aff, _ = R.osv_affected_ranges(custom, semver)
    assert [(t.op_code, t.version) for t in aff][-4:] == [
        ("orgteq", "0"),
        ("andlt", "1.0.0"),
        ("orgteq", "1.0.0"),
        ("andlt", "1.2.3"),
    ]


def test_matches_ranges():
    terms = [("gteq", "1.3.0"), ("andlt", "1.3.2"), ("orgteq", "1.4.0"), ("andlt", "1.4.11")]
    assert R.matches_ranges("1.3.1", terms)
    assert not R.matches_ranges("1.3.2", terms)
    assert R.matches_ranges("1.4.5", terms)
    assert not R.matches_ranges("1.5.0", terms)
    assert R.matches_ranges("2.0", [("gt", "1.0")])
    assert R.matches_ranges("1.0", [("", "1.0")])
    assert not R.matches_ranges("1.1", [("eq", "1.0")])
    assert not R.matches_ranges("1.0", [])
    # openshift-style branch qualifier "4.5.0,4.5"
    assert R.matches_ranges("4.4.9", [("lt", "4.5.0,4.5")])
