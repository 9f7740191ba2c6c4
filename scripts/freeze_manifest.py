"""Freeze a per-query implementation manifest for the rotation lint.

The r9 verdict flagged a hand-written window comment that MIS-claimed
which queries were in the correctness rotation; scripts/rotation_audit.py
mechanized the "who was verdicted when" half. This script mechanizes the
other half — "which queries did this round's code changes actually
touch" — so test_round_lint can FAIL when a query's implementation
changed after its latest driver verdict without the query being put back
into the first-50 window (the silent-stale-verdict class).

For every registered query it records:

- a sha256 of every repo source file EXECUTED while building the query's
  DataFrame at sf0.001 (a ``sys.setprofile`` trace during the
  ``queries()[name](spark, sf_dir)`` call — runtime attribution, not a
  hand-maintained file map; eager compilers run their build jobs, which
  is exactly the code we want attributed);
- a sha256 of the registered callable's own source text (so edits to its
  queries.py registration flag ONLY that query, not everyone sharing the
  file);
- a sha256 of its oracle SQL string.

queries.py and __spark_entry__.py are excluded from the traced-file set
(every query executes them; the callable-source digest covers the
per-query slice). Python-worker UDF bodies execute out of process and
are not traced, but their DEFINING module is imported/executed at plan
build, so edits to it still flag. Best-effort tripwire, not a proof.

Usage: python scripts/freeze_manifest.py <round> [sf_dir]
Writes MANIFEST_r{round}.json at the repo root. Run it at round close,
AFTER the final code commit, alongside the bench artifact.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = os.path.join(REPO, "raise_featurestore_spark")
EXCLUDE = {
    os.path.join(PKG, "queries.py"),
    os.path.join(REPO, "__spark_entry__.py"),
}


def _sha(path: str) -> str:
    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _text_sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def build_manifest(sf_dir: str) -> dict:
    import __spark_entry__ as em
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("freeze-manifest")
    qs, oracles = em.queries(), em.oracle_sql()
    manifest: dict[str, dict] = {}
    for name, fn in qs.items():
        traced: set[str] = set()

        def prof(frame, event, arg):
            if event in ("call", "return"):
                f = frame.f_code.co_filename
                if f.startswith(PKG) and f not in EXCLUDE:
                    traced.add(f)

        sys.setprofile(prof)
        try:
            fn(spark, sf_dir)
        finally:
            sys.setprofile(None)
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        manifest[name] = {
            "files": {
                os.path.relpath(p, REPO): _sha(p) for p in sorted(traced)
            },
            "callable_sha": _text_sha(src),
            "oracle_sha": _text_sha(oracles.get(name, "")),
        }
    spark.stop()
    return manifest


def main() -> None:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    manifest = build_manifest(sf_dir)
    out = os.path.join(REPO, f"MANIFEST_r{rnd:02d}.json")
    with open(out, "w") as fh:
        json.dump({"round": rnd, "queries": manifest}, fh, indent=1, sort_keys=True)
    n_files = len({f for q in manifest.values() for f in q["files"]})
    print(f"wrote {out}: {len(manifest)} queries over {n_files} traced files")


if __name__ == "__main__":
    main()
