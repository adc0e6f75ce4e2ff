"""Pre-commit gate: pytest + strict oracle verify in one command.

The round-3 ``intent_actions`` red shipped because the builder never
re-ran its own verify after an oracle edit. This script makes the
cheap version of that check a single command:

    python bench/preflight.py                 # changed-files mode
    python bench/preflight.py --all           # every query, sf0.001
    python bench/preflight.py q1 q2 ...       # explicit queries

Changed-files mode diffs the working tree + HEAD~1 against the query
registry: any touched ``kgp/<mod>.py`` runs its ``tests/test_<mod>.py``
(when present) and every gate query whose ``_q_*`` body or oracle
mentions the module. Exits non-zero on any red — wire it before every
commit that touches gate-visible code.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _changed_modules() -> set[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", "HEAD~1"], cwd=REPO,
        capture_output=True, text=True).stdout
    out += subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True).stdout
    mods = set()
    for line in out.splitlines():
        path = line.split()[-1] if line.strip() else ""
        if path.startswith("kgp/") and path.endswith(".py"):
            mods.add(os.path.basename(path)[:-3])
        if path == "__spark_entry__.py" or path.startswith("kgp/oracle"):
            mods.add("__entry__")
    return mods


def _queries_for(mods: set[str]) -> list[str]:
    """Map changed kgp modules -> gate queries via source mention."""
    import inspect

    import __spark_entry__ as entry
    from kgp import oracle as _o
    oracle_src = inspect.getsource(_o)
    hits = []
    for name, fn in entry.queries().items():
        src = inspect.getsource(fn)
        if "__entry__" in mods:
            hits.append(name)
            continue
        for m in mods:
            if (f"kgp.{m}" in src or f"from kgp import {m}" in src
                    or (f"kgp/{m}.py" in oracle_src and name in oracle_src)):
                hits.append(name)
                break
    return hits


def main() -> None:
    args = sys.argv[1:]
    sf = os.environ.get("PREFLIGHT_SF", "/root/testdata/sf0.001")

    if args and args[0] == "--all":
        queries: list[str] | None = None
        tests = ["tests/"]
    elif args:
        queries = args
        tests = []
    else:
        mods = _changed_modules()
        queries = _queries_for(mods)
        tests = [f"tests/test_{m}.py" for m in mods
                 if os.path.exists(os.path.join(REPO, f"tests/test_{m}.py"))]
        print(f"preflight: modules={sorted(mods)} "
              f"queries={queries} tests={tests}", flush=True)

    rc = 0
    if tests:
        rc |= subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q", *tests],
            cwd=REPO).returncode
    if queries is None:
        rc |= subprocess.run(
            [sys.executable, "bench/verify_queries.py", sf],
            cwd=REPO).returncode
    elif queries:
        rc |= subprocess.run(
            [sys.executable, "bench/verify_queries.py", sf, *queries],
            cwd=REPO).returncode
    print("PREFLIGHT", "RED" if rc else "GREEN")
    sys.exit(1 if rc else 0)


if __name__ == "__main__":
    main()
