"""Ratchet lint: engine ROUND is banned from emitted values.

Spark's F.round rounds HALF_UP on the shortest decimal repr while DuckDB's
ROUND rounds the binary value — they disagree on .xxx5 repr-ties, which are
common on int/int ratios and quantized data (the r4/r5 driver-flake class;
see functions/stable.py and the r6 sweep that converted ~119 sites to
grid_snap/stable_round). This test freezes the surviving site count per
file so new engine-ROUND emissions cannot creep in unnoticed.

The r6 sweep eliminated every code site; any NEW site must use the stable
helpers, or prove tie-freedom and add itself to the RATCHET allowlist with
a comment.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "raise_featurestore_spark"

# file (relative to the package) -> max allowed engine-ROUND code sites
# (empty: the r6 sweep eliminated every site; keep the dict for the
# documented escape hatch)
RATCHET: dict[str, int] = {}

_PATTERN = re.compile(r"F\.round\(|(?<![_A-Za-z])ROUND\(")
_SAFE = re.compile(r"grid_snap|stable_round|sig_round")


def _code_sites(path: Path) -> list[str]:
    hits = []
    for i, line in enumerate(path.read_text().splitlines(), 1):
        stripped = line.strip()
        if stripped.startswith("#") or "``" in line:
            # comments and reST-style docstring mentions
            continue
        # drop trailing comments crudely; string literals containing ROUND
        # are exactly the SQL-twin emission sites we want to count
        code = line.split("  # ")[0]
        if _PATTERN.search(code) and not _SAFE.search(code):
            hits.append(f"{path.name}:{i}: {stripped[:100]}")
    return hits


def test_no_new_engine_round_sites():
    failures = []
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        hits = _code_sites(py)
        allowed = RATCHET.get(rel, 0)
        if len(hits) > allowed:
            failures.append(
                f"{rel}: {len(hits)} engine-ROUND sites (allowed {allowed}):\n  "
                + "\n  ".join(hits)
            )
    assert not failures, (
        "engine ROUND on emitted values is banned (emission rules; use "
        "functions/stable.grid_snap / stable_round in BOTH twins):\n"
        + "\n".join(failures)
    )


def test_bench_artifact_committed():
    """r10 VERDICT item 4 (bookkeeping): the committed BENCH_local.json
    must be the artifact the round ledger quotes — a modified-uncommitted
    copy in the working tree means the quoted numbers aren't the recorded
    ones. Run bench, then commit the refreshed artifact with the change
    that motivated the run."""
    import subprocess

    repo = Path(__file__).resolve().parent.parent
    if not (repo / ".git").exists() or not (repo / "BENCH_local.json").exists():
        return
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--", "BENCH_local.json"],
            cwd=repo, capture_output=True, text=True, timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return
    assert out.stdout.strip() == "", (
        "BENCH_local.json is modified but uncommitted — commit the bench "
        "artifact the ledger quotes (r10 VERDICT 'what's wrong' #3)"
    )


def test_no_silent_stale_rewrites():
    """r10 VERDICT item 8: a query whose implementation changed since its
    latest driver verdict must be in the upcoming first-50 correctness
    window — otherwise its green verdict silently describes code that no
    longer exists (the r9 wrong-window-comment class, now checked
    end-to-end). Facts are machine-derived: scripts/freeze_manifest.py
    records per-query file/callable/oracle digests at each round close;
    this test compares the digests recorded at each query's latest
    verdict round against the current tree. No manifest for that round
    (rounds <= r10 predate the mechanism) => query is skipped."""
    import hashlib
    import json
    import re

    repo = Path(__file__).resolve().parent.parent
    verdict_round: dict[str, int] = {}
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        data = json.loads(p.read_text())
        for name in data.get("queries", data):
            verdict_round[name] = max(verdict_round.get(name, 0), rnd)

    manifests: dict[int, dict] = {}
    for p in sorted(repo.glob("MANIFEST_r*.json")):
        m = json.loads(p.read_text())
        manifests[int(m["round"])] = m["queries"]
    if not manifests:
        return  # mechanism starts at r11; nothing to compare yet

    import sys

    sys.path.insert(0, str(repo))
    import inspect

    import __spark_entry__ as em

    qs, oracles = em.queries(), em.oracle_sql()
    window = set(list(qs)[:50])

    def _sha(b: bytes) -> str:
        return hashlib.sha256(b).hexdigest()

    stale = []
    for name, fn in qs.items():
        if name in window:
            continue  # about to be re-verdicted: changes are fine
        rec = manifests.get(verdict_round.get(name, -1), {}).get(name)
        if rec is None:
            continue  # verdict predates the manifest mechanism
        reasons = []
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        if _sha(src.encode()) != rec["callable_sha"]:
            reasons.append("registered callable changed")
        if _sha(oracles.get(name, "").encode()) != rec["oracle_sha"]:
            reasons.append("oracle SQL changed")
        for rel, want in rec["files"].items():
            f = repo / rel
            if not f.exists() or _sha(f.read_bytes()) != want:
                reasons.append(f"{rel} changed")
        if reasons:
            stale.append(f"{name} (verdict r{verdict_round[name]}): "
                         + "; ".join(reasons[:4]))
    assert not stale, (
        "implementation changed after the latest driver verdict without "
        "re-windowing the query — put these in the first-50 window (or "
        "re-freeze the manifest if the change is provably inert):\n  "
        + "\n  ".join(stale)
    )
