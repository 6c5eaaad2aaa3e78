"""Auto-rerun of load-skipped multi-process distributed tests.

tests/test_distributed_multiprocess.py skips when the single host core is
saturated (Gloo's ~30 s rendezvous expires under concurrent XLA compiles) or
when the sandbox forbids the localhost coordinator socket. Those skips are
environment-capacity verdicts, not product verdicts — but inside the full
suite they mean the distributed tier silently never executed.

This plugin (imported by tests/conftest.py) records such load-skips and, at
session finish of an otherwise-green run, re-runs exactly those tests
standalone (the core is free by then). A rerun failure fails the session; a
rerun that still skips is reported (a sandbox that truly forbids sockets
keeps the designed skip semantics).

The reference has no distributed tier at all (SURVEY.md §2.3); this guards
ours (VERDICT round-2 weak item #7).
"""

from __future__ import annotations

import os
import subprocess
import sys

DIST_FILE = "test_distributed_multiprocess.py"

# Substrings of the pytest.skip(...) reasons that mark ENVIRONMENT skips in
# test_distributed_multiprocess.py (handshake/compile timeouts and Gloo/socket
# init failures). A real assertion failure never skips, so it never matches.
LOAD_SKIP_PATTERNS = (
    "sandboxed environment",
    "cold compile on 1 core",
    "socket/Gloo",
)

# Set in the rerun child so it never recurses into another rerun.
RERUN_ENV = "LEANYOLO_DIST_RERUN"

_load_skipped: list[str] = []


def is_load_skip(nodeid: str, longrepr: str) -> bool:
    """True when a skip report is a distributed-tier environment/load skip."""
    return DIST_FILE in nodeid and any(p in longrepr for p in LOAD_SKIP_PATTERNS)


def rerun_standalone(nodeids, root, timeout=3600):
    """Re-run the given node ids serially in a fresh pytest process."""
    env = {**os.environ, RERUN_ENV: "1"}
    cmd = [sys.executable, "-m", "pytest", "-q", "-rs", "-p", "no:cacheprovider", *nodeids]
    return subprocess.run(
        cmd, cwd=str(root), env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def pytest_runtest_logreport(report):
    if report.skipped and is_load_skip(report.nodeid, str(report.longrepr)):
        _load_skipped.append(report.nodeid)


def pytest_sessionfinish(session, exitstatus):
    if not _load_skipped or os.environ.get(RERUN_ENV) == "1":
        return
    if int(exitstatus) != 0:
        return  # suite is red anyway; don't stack a long rerun on a failure
    nodeids = sorted(set(_load_skipped))
    _load_skipped.clear()
    print(
        f"\n[dist-rerun] {len(nodeids)} distributed test(s) load-skipped "
        "during the suite; re-running standalone now that the core is free:",
        flush=True,
    )
    for n in nodeids:
        print(f"[dist-rerun]   {n}", flush=True)
    try:
        res = rerun_standalone(nodeids, session.config.rootpath)
    except subprocess.TimeoutExpired:
        print(
            "[dist-rerun] WARNING: standalone rerun timed out — the "
            "distributed tier did NOT execute; run "
            f"`pytest {DIST_FILE}` manually.",
            flush=True,
        )
        return
    tail = "\n".join(res.stdout.splitlines()[-15:])
    print(f"[dist-rerun] rerun exit={res.returncode}\n{tail}", flush=True)
    if res.returncode != 0:
        print("[dist-rerun] FAILING session: standalone rerun failed.", flush=True)
        session.exitstatus = 1
