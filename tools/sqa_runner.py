#!/usr/bin/env python
"""SQA runner: execute the sqa.yaml test matrix, collect artifacts, report.

Counterpart of the reference's agent-driven QA runner
(reference: tools/sqa_runner.py:55-674). Two modes:

- `--mode shell` (default): run each test's steps as shell commands directly;
  a test passes when every step exits 0.
- `--mode agent`: build a prompt per test and shell out to an agent CLI
  (`--agent-cmd`, e.g. a Codex-style tool); status is inferred from an
  explicit `TEST STATUS: PASSED|FAILED` line, pytest summary hints, then the
  exit code (reference sqa_runner.py:157-182).

Per-test artifacts (cmd.txt / stdout.log / meta.json / status.txt) land under
--out-dir, plus a rollup report.json / report.md. `--failed-missing` reruns
only tests that previously failed or never ran; `--ids` filters explicitly.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shlex
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STATUS_RE = re.compile(r"TEST STATUS:\s*(PASSED|FAILED)", re.IGNORECASE)
PYTEST_FAIL_RE = re.compile(r"(\d+) failed")
PYTEST_PASS_RE = re.compile(r"(\d+) passed")


def load_plan(path: str) -> dict:
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def infer_status(output: str, exit_code: int) -> str:
    m = list(STATUS_RE.finditer(output))
    if m:
        return m[-1].group(1).upper()
    if PYTEST_FAIL_RE.search(output):
        return "FAILED"
    if exit_code == 0:
        return "PASSED"
    return "FAILED"


def run_shell(test: dict, env: dict, workdir: str, log_path: Path, timeout: int) -> tuple:
    t0 = time.time()
    with open(log_path, "w", encoding="utf-8") as log:
        for step in test.get("steps", []):
            log.write(f"$ {step}\n")
            log.flush()
            proc = subprocess.run(
                step, shell=True, cwd=workdir, env=env, stdout=log, stderr=subprocess.STDOUT, timeout=timeout
            )
            if proc.returncode != 0:
                log.write(f"\n[step failed with exit {proc.returncode}]\n")
                return "FAILED", time.time() - t0
    return "PASSED", time.time() - t0


def run_agent(test: dict, env: dict, workdir: str, log_path: Path, agent_cmd: str, timeout: int) -> tuple:
    prompt = (
        f"Execute SQA test {test['id']} ({test.get('name', '')}).\n"
        "Steps:\n" + "\n".join(f"  {s}" for s in test.get("steps", [])) + "\n"
        f"Expected: {test.get('expected', '')}\n"
        "Run the steps, check the expectation, and print exactly one line "
        "'TEST STATUS: PASSED' or 'TEST STATUS: FAILED' at the end."
    )
    t0 = time.time()
    with open(log_path.parent / "prompt.txt", "w", encoding="utf-8") as f:
        f.write(prompt)
    proc = subprocess.run(
        shlex.split(agent_cmd) + [prompt],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    output = proc.stdout + proc.stderr
    log_path.write_text(output, encoding="utf-8")
    return infer_status(output, proc.returncode), time.time() - t0


def main() -> None:
    p = argparse.ArgumentParser(description="SQA matrix runner")
    p.add_argument("--plan", default="sqa.yaml")
    p.add_argument("--out-dir", default="runs/sqa_report")
    p.add_argument("--mode", choices=["shell", "agent"], default="shell")
    p.add_argument("--agent-cmd", default=None, help="agent CLI for --mode agent")
    p.add_argument("--ids", default=None, help="comma-separated test-id filter")
    p.add_argument("--failed-missing", action="store_true", help="rerun only failed/missing tests")
    p.add_argument(
        "--timeout", type=int, default=3600,
        help="PER-STEP timeout in shell mode (a k-step test may run up to "
        "k*timeout wall-clock); whole-run timeout in agent mode",
    )
    args = p.parse_args()

    plan = load_plan(args.plan)
    settings = plan.get("settings", {})
    base_env = dict(os.environ)
    base_env.update({k: str(v) for k, v in settings.get("env", {}).items()})

    def test_env(test: dict) -> dict:
        """Plan env merged with the test's own `env:` block. An EMPTY value
        removes the variable — how a backend-sensitive test (QT-001) opts
        out of the plan-wide JAX_PLATFORM_NAME=cpu pin and runs on the
        default backend (the TPU when present)."""
        env = dict(base_env)
        for k, v in (test.get("env") or {}).items():
            if str(v) == "":
                env.pop(k, None)
            else:
                env[k] = str(v)
        return env

    workdir = settings.get("workdir", ".")
    out_root = Path(args.out_dir)
    out_root.mkdir(parents=True, exist_ok=True)

    tests = plan.get("tests", [])
    if args.ids:
        keep = set(args.ids.split(","))
        tests = [t for t in tests if t["id"] in keep]
    if args.failed_missing:
        def needs_run(t):
            status_file = out_root / t["id"] / "status.txt"
            return not status_file.exists() or status_file.read_text().strip() != "PASSED"

        tests = [t for t in tests if needs_run(t)]

    results = []
    for test in tests:
        tdir = out_root / test["id"]
        tdir.mkdir(parents=True, exist_ok=True)
        (tdir / "cmd.txt").write_text("\n".join(test.get("steps", [])), encoding="utf-8")
        log_path = tdir / "stdout.log"
        print(f"[{test['id']}] {test.get('name', '')} ...", flush=True)
        try:
            if args.mode == "agent":
                if not args.agent_cmd:
                    raise SystemExit("--mode agent requires --agent-cmd")
                status, dur = run_agent(test, test_env(test), workdir, log_path, args.agent_cmd, args.timeout)
            else:
                status, dur = run_shell(test, test_env(test), workdir, log_path, args.timeout)
        except subprocess.TimeoutExpired as te:
            status, dur = "FAILED", float(args.timeout)
            # APPEND the marker — overwriting would destroy the captured
            # step output, the one artifact that shows which step hung.
            with open(log_path, "a", encoding="utf-8") as lf:
                lf.write(f"\n[timeout after {args.timeout}s on: {te.cmd}]\n")
        (tdir / "status.txt").write_text(status, encoding="utf-8")
        meta = {"id": test["id"], "name": test.get("name", ""), "status": status, "seconds": round(dur, 1)}
        (tdir / "meta.json").write_text(json.dumps(meta), encoding="utf-8")
        results.append(meta)
        print(f"[{test['id']}] {status} ({dur:.1f}s)")

    n_pass = sum(r["status"] == "PASSED" for r in results)
    report = {"total": len(results), "passed": n_pass, "failed": len(results) - n_pass, "tests": results}
    (out_root / "report.json").write_text(json.dumps(report, indent=2), encoding="utf-8")
    md = ["# SQA report", "", f"{n_pass}/{len(results)} passed", "", "| id | name | status | seconds |", "|---|---|---|---|"]
    md += [f"| {r['id']} | {r['name']} | {r['status']} | {r['seconds']} |" for r in results]
    (out_root / "report.md").write_text("\n".join(md) + "\n", encoding="utf-8")
    print(f"report: {out_root / 'report.md'} ({n_pass}/{len(results)} passed)")
    if n_pass != len(results):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
