"""Doc-integrity guard (round-9 verdict, "What's wrong" #1).

Round 9 shipped docs citing artifacts that were never created
(``SWEEP_SF*_r09.log``, ``SPANDEDUP_AB_r09.json``,
``BUCKETED_AB_L24_r09.json``) — each claim was plausibly true, but a
repo whose docs cite nonexistent files loses the benefit of the doubt
on every other claim.  This test makes that failure mode mechanical:
every repo-relative ``*.json`` / ``*.log`` artifact filename cited in
the evidence docs must exist in the tree.  Pure-filesystem test — no
Spark session.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the docs that make evidence claims
DOCS = ["README.md", "COVERAGE.md", "BENCHMARKS.md", "QUERIES.md"]

#: a backticked token that names one artifact file.  Only .json/.log
#: are artifact classes the docs cite as evidence; source files are
#: covered by the test suite importing them.
_ARTIFACT = re.compile(r"`([A-Za-z0-9_][A-Za-z0-9_./-]*\.(?:json|log))`")

#: artifacts the docs may cite as explicitly ABSENT/retracted (the
#: sentence must make non-existence clear; listing here keeps the
#: guard honest about deliberate retractions instead of forcing doc
#: rewrites to dodge the regex)
ALLOWED_MISSING: set[str] = {
    # round-10 session restart lost the uncommitted SCALE-24 attribution
    # log; COVERAGE.md / BENCHMARKS.md cite it only inside an explicit
    # retraction note (the matrix's numbers are marked unverifiable and
    # the reproduction script is named)
    "SCALE24_r10.log",
}


def cited_artifacts() -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.isfile(path):
            continue
        with open(path) as fh:
            text = fh.read()
        out[doc] = set(_ARTIFACT.findall(text))
    return out


def test_every_cited_artifact_exists():
    missing: list[str] = []
    for doc, names in cited_artifacts().items():
        for name in sorted(names):
            if name in ALLOWED_MISSING:
                continue
            if not os.path.exists(os.path.join(REPO, name)):
                missing.append(f"{doc} cites {name}")
    assert not missing, (
        "docs cite artifacts that do not exist in the tree (run the "
        "bench or retract the claim): " + "; ".join(missing)
    )


def test_guard_sees_the_known_artifacts():
    """The regex must actually match the citation style the docs use —
    an empty extraction would make the guard vacuous."""
    found = set().union(*cited_artifacts().values())
    assert any(n.startswith("SWEEP_") for n in found), found
    assert any(n.startswith("BENCH_") for n in found), found
