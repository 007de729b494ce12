"""Execution test for scripts/tpu_capture_queue.sh.

The queue fires UNATTENDED when the TPU tunnel returns (a watcher runs it),
so a flag rename or a moved script must fail CI, not the one shot at the
round's perf artifacts. Mirrors tests/test_remote_scripts.py: run the real
script against a mock toolchain on PATH that records every invocation, then
assert ordering, script paths, and that every recorded CLI flag still exists
in the real parsers.
"""

import os
import re
import stat
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
QUEUE = REPO / "scripts" / "tpu_capture_queue.sh"


def _write_mock(bin_dir: Path, name: str, body: str) -> None:
    p = bin_dir / name
    p.write_text("#!/usr/bin/env bash\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)


@pytest.fixture()
def queue_run(tmp_path):
    """Run the queue with mocked python/vlm-* binaries; return the call log
    and the perf dir."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    log = tmp_path / "calls.log"
    # every mock records "<name> <args>"; python also emits a JSON line
    # (bench.py's contract) and honors --output so artifact paths appear
    body = (
        f'echo "$(basename "$0") $@" >> "{log}"\n'
        'out=""\n'
        'prev=""\n'
        'for a in "$@"; do [ "$prev" = "--output" ] && out="$a"; prev="$a"; done\n'
        '[ -n "$out" ] && echo "{\\"mock\\": true}" > "$out"\n'
        'echo "{\\"metric\\": \\"mock\\", \\"value\\": 1}"\n'
    )
    for name in ("python", "vlm-data", "vlm-eval"):
        _write_mock(bin_dir, name, body)

    perf = tmp_path / "perf"
    env = dict(os.environ)
    env["PATH"] = f"{bin_dir}:{env['PATH']}"
    env["EVAL_DATA"] = str(tmp_path / "eval-data")  # no manifest -> synth runs
    r = subprocess.run(
        ["bash", str(QUEUE), str(perf)], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    calls = log.read_text().strip().splitlines()
    return calls, perf


def _harvest_flags(source: Path) -> set:
    """Every --flag declared via add_argument in a CLI source file."""
    return set(re.findall(r'add_argument\(\s*"(--[a-z0-9-]+)"',
                          source.read_text()))


def test_queue_invocation_order(queue_run):
    calls, _ = queue_run
    seq = [c for c in calls if c.startswith(("python", "vlm-"))]
    # step order from the queue header: bench default, bench --skip-train,
    # bench 9B, encoder micro, encoder full, synth, eval, early-stop
    expect = [
        ("python bench.py", ""),
        ("python bench.py", "--skip-train"),
        ("python bench.py", "--preset gemma2_9b"),
        ("python", "encoder_mm_ab.py --micro"),
        ("python", "encoder_mm_ab.py"),
        ("vlm-data synth", ""),
        ("vlm-data precache", ""),
        ("vlm-eval", "--kv-int8"),
        ("python", "early_stop_ab.py"),
        ("python", "int4_mlp_probe.py"),
        ("python", "int4_stack_ab.py"),
        ("python bench.py", "--mlp-int4"),
        ("python", "batch_sweep.py"),
    ]
    assert len(seq) == len(expect), seq
    for call, (prefix, must_contain) in zip(seq, expect):
        assert call.startswith(prefix), (call, prefix)
        assert must_contain in call, (call, must_contain)


def test_queue_scripts_exist(queue_run):
    calls, _ = queue_run
    for call in calls:
        for tok in call.split():
            if tok.endswith(".py") or tok.endswith(".sh"):
                assert (REPO / tok).exists(), f"queue references missing {tok}"


def test_queue_artifacts_land_in_perf(queue_run):
    calls, perf = queue_run
    produced = {p.name for p in perf.glob("*.json")}
    # tee'd bench outputs + --output artifacts, one per queue step
    assert {"bench_r4_default.json", "decode_2b_batch64_fused.json",
            "decode_9b_batch32_fused.json", "encoder_mm_micro.json",
            "encoder_mm_full.json", "eval_e2e.json",
            "early_stop_ab.json"} <= produced, produced


def test_queue_flags_exist_in_real_parsers(queue_run):
    """Flag-drift guard: every flag the queue passes must still be declared
    by the target CLI's argparse."""
    calls, _ = queue_run
    parsers = {
        "vlm-eval": _harvest_flags(
            REPO / "vlm_bridge_tpu" / "inference" / "evaluate.py")
        | _harvest_flags(REPO / "vlm_bridge_tpu" / "tools" / "loading.py"),
        "vlm-data": _harvest_flags(REPO / "vlm_bridge_tpu" / "data" / "cli.py"),
        "bench.py": _harvest_flags(REPO / "bench.py"),
        "encoder_mm_ab.py": _harvest_flags(
            REPO / "scripts" / "encoder_mm_ab.py"),
        "early_stop_ab.py": _harvest_flags(
            REPO / "scripts" / "early_stop_ab.py"),
        "int4_stack_ab.py": _harvest_flags(
            REPO / "scripts" / "int4_stack_ab.py"),
        "batch_sweep.py": _harvest_flags(
            REPO / "scripts" / "batch_sweep.py"),
    }
    for call in calls:
        toks = call.split()
        target = next((k for k in parsers if k in (toks[0], *toks[1:3])), None)
        if target is None:
            continue
        declared = parsers[target]
        # BooleanOptionalAction flags also accept a --no- prefix
        declared |= {f.replace("--", "--no-", 1) for f in set(declared)}
        for tok in toks:
            if tok.startswith("--"):
                assert tok in declared, (
                    f"{target} no longer declares {tok} (queue drift)")


def test_queue_resumes_without_redoing_captured_steps(queue_run, tmp_path):
    """A retry after a mid-queue tunnel drop must skip steps whose
    artifacts already landed (each capture costs up to ~40 min on chip)."""
    calls_first, perf = queue_run
    # second run over the SAME perf dir: everything already captured
    bin_dir = tmp_path / "bin"
    log = tmp_path / "calls.log"
    n_first = len(log.read_text().strip().splitlines())
    env = dict(os.environ)
    env["PATH"] = f"{bin_dir}:{env['PATH']}"
    env["EVAL_DATA"] = str(tmp_path / "eval-data")
    r = subprocess.run(["bash", str(QUEUE), str(perf)], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    n_second = len(log.read_text().strip().splitlines())
    assert n_second == n_first, "a captured step re-ran on resume"
    assert r.stdout.count("SKIP") >= 9, r.stdout

    # partial resume: drop ONE artifact -> exactly that step re-runs
    (perf / "int4_stack_ab.json").unlink()
    r = subprocess.run(["bash", str(QUEUE), str(perf)], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    new_calls = log.read_text().strip().splitlines()[n_second:]
    assert len(new_calls) == 1 and "int4_stack_ab.py" in new_calls[0], \
        new_calls


def test_queue_retries_error_artifacts(queue_run, tmp_path):
    """An artifact carrying an 'error' field (bench's outage JSON) does not
    count as captured — the retry must redo that step."""
    _, perf = queue_run
    (perf / "decode_9b_batch32_fused.json").write_text(
        '{"error": "backend unavailable", "metric": "decode"}\n')
    bin_dir = tmp_path / "bin"
    log = tmp_path / "calls.log"
    n0 = len(log.read_text().strip().splitlines())
    env = dict(os.environ)
    env["PATH"] = f"{bin_dir}:{env['PATH']}"
    env["EVAL_DATA"] = str(tmp_path / "eval-data")
    r = subprocess.run(["bash", str(QUEUE), str(perf)], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    new_calls = log.read_text().strip().splitlines()[n0:]
    assert len(new_calls) == 1 and "gemma2_9b" in new_calls[0], new_calls
