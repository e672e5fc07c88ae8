"""Self-reporting CEP pattern-surface parity: enumerate every public
combinator on the reference's Pattern.java and assert each is mapped to
an implemented analog or to a documented absence — the same discipline
as tests/test_gelly_parity.py, so a combinator added to the reference
(or a mapping dropped here) fails by name."""

from __future__ import annotations

import os
import re

import pytest

_PATTERN_JAVA = (
    "/root/reference/Flink-TornadoVM/flink-libraries/flink-cep/"
    "src/main/java/org/apache/flink/cep/pattern/Pattern.java"
)

#: combinator → analog (queries/cep.py unless noted). Streaming twins
#: in streaming/cep.py where listed in COVERAGE.md §2.G.
IMPLEMENTED = {
    "begin": "the pattern parameters opening each query (A_TYPE et al.)",
    "next": "cep_next",
    "notNext": "cep_not_next",
    "followedBy": "cep_followed_by",
    "notFollowedBy": "cep_not_followed_by",
    "followedByAny": "cep_followed_by_any",
    "times": "cep_times (times(n)) / cep_times_range (times(from,to))",
    "timesOrMore": "cep_times — its >= n predicate IS timesOrMore",
    "oneOrMore": "cep_one_or_more",
    "optional": "cep_optional",
    "until": "cep_one_or_more_until",
    "within": "the INTERVAL bound in every time-constrained query",
    "consecutive": "the gaps-and-islands runs in the looping quantifiers",
    "greedy": "documented: greedy ≡ reluctant under consecutive+next "
        "(cep.py AfterMatchSkipStrategy section)",
    "where": "Column predicates on the event frame",
    "or": "Column | predicates",
    "subtype": "event_type filters (the type system is the schema)",
    "getPrevious": "not a combinator (builder introspection)",
    "getAfterMatchSkipStrategy": "cep_after_match(strategy)",
    "allowCombinations": "cep_allow_combinations — full NFA semantics "
        "(NO_SKIP starts at every run element, next(B) anchors the "
        "end): the 2^(k-1) subsets containing the run's last A, "
        "enumerated up to COMB_MAX_RUN (the output is intrinsically "
        "exponential; the cap is the documented bound); stream twin "
        "cep_allow_combinations_stream",
}

#: Documented absences with the reason (empty: the whole public
#: Pattern.java combinator set is accounted for as of round 5).
ABSENT: dict[str, str] = {}


def _public_methods():
    src = open(_PATTERN_JAVA).read()
    names = set(
        re.findall(
            r"public\s+(?:static\s+)?(?:<[^>]+>\s+)?"
            r"(?:Pattern|GroupPattern)<[^>]*>\s+(\w+)\s*\(",
            src,
        )
    )
    return names


def test_every_pattern_combinator_accounted_for():
    if not os.path.isfile(_PATTERN_JAVA):
        pytest.skip("reference tree not mounted")
    methods = _public_methods()
    accounted = set(IMPLEMENTED) | set(ABSENT)
    missing = sorted(methods - accounted)
    stale = sorted((set(IMPLEMENTED) | set(ABSENT)) - methods - {
        "getAfterMatchSkipStrategy",  # declared on the builder chain
    })
    assert not missing, f"unmapped Pattern.java combinators: {missing}"
    assert not stale, f"mappings to nonexistent combinators: {stale}"


def test_named_query_analogs_exist():
    """EVERY cep_* analog named anywhere in a mapping string must
    exist (multi-target mappings like times → cep_times /
    cep_times_range check all of them)."""
    from flink_tornadovm_artifact_spark import streaming
    from flink_tornadovm_artifact_spark.queries import cep

    for target in IMPLEMENTED.values():
        for name in re.findall(r"cep_\w+", target):
            fn = getattr(cep, name, None) or (
                getattr(streaming, name, None) if name.endswith("_stream") else None
            )
            assert callable(fn), name
