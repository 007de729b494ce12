"""Execution tests for the remote-ops scripts (SURVEY §2 #22).

The scripts can't reach a real TPU VM from CI, so they run against a mock
toolchain: a fake `gcloud` (and for the bootstrap: apt-get/pip/tmux/...)
prepended to PATH that records every invocation. This executes the actual
glue logic — argument plumbing, env guards, command ordering, the tar
push — instead of only `bash -n` syntax checks.

Reference counterparts: scripts/control_vastai_local.sh:129-213 and
scripts/setup_vastai_remote.sh:23-85.
"""

import gzip
import os
import stat
import subprocess
import tarfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
CONTROL = REPO / "scripts" / "control_tpu_local.sh"
SETUP = REPO / "scripts" / "setup_tpu_vm.sh"


def _write_mock(bin_dir: Path, name: str, body: str) -> None:
    p = bin_dir / name
    p.write_text("#!/usr/bin/env bash\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)


@pytest.fixture()
def mock_gcloud(tmp_path):
    """PATH dir with a gcloud that logs args and captures stdin per call."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    log = tmp_path / "gcloud.log"
    stdin_dir = tmp_path / "stdin"
    stdin_dir.mkdir()
    _write_mock(
        bin_dir, "gcloud",
        f'echo "$@" >> "{log}"\n'
        f'n=$(wc -l < "{log}")\n'
        # capture stdin only when it is a pipe (the tar push); terminal
        # stdin would block
        f'if [ ! -t 0 ]; then cat > "{stdin_dir}/call_$n" || true; fi\n'
        "exit 0\n",
    )
    return bin_dir, log, stdin_dir


def _run_control(args, bin_dir, env_extra=None, cwd=None):
    env = dict(os.environ)
    env["PATH"] = f"{bin_dir}:{env['PATH']}"
    env.update(env_extra or {})
    return subprocess.run(
        ["bash", str(CONTROL), *args], env=env, cwd=cwd or REPO,
        capture_output=True, text=True, timeout=60)


class TestControlScript:
    def test_requires_tpu_name(self, mock_gcloud):
        bin_dir, _, _ = mock_gcloud
        env = {k: v for k, v in os.environ.items() if k not in ("TPU_NAME", "ZONE")}
        env["PATH"] = f"{bin_dir}:{env['PATH']}"
        r = subprocess.run(["bash", str(CONTROL), "status"], env=env,
                           capture_output=True, text=True, timeout=60)
        assert r.returncode != 0
        assert "TPU_NAME" in r.stderr

    def test_unknown_command_usage(self, mock_gcloud):
        bin_dir, _, _ = mock_gcloud
        r = _run_control(["frobnicate"], bin_dir,
                         {"TPU_NAME": "t", "ZONE": "z"})
        assert r.returncode != 0
        assert "usage:" in r.stderr

    def test_status_tails_training_log(self, mock_gcloud):
        bin_dir, log, _ = mock_gcloud
        r = _run_control(["status"], bin_dir, {"TPU_NAME": "t", "ZONE": "z"})
        assert r.returncode == 0, r.stderr
        calls = log.read_text().splitlines()
        assert len(calls) == 1
        assert "compute tpus tpu-vm ssh t --zone z" in calls[0]
        assert "tail -n 40" in calls[0]

    def test_stop_kills_tmux_session(self, mock_gcloud):
        bin_dir, log, _ = mock_gcloud
        r = _run_control(["stop"], bin_dir, {"TPU_NAME": "t", "ZONE": "z"})
        assert r.returncode == 0, r.stderr
        assert "tmux kill-session -t train" in log.read_text()

    def test_download_rsyncs_both_artifact_dirs(self, mock_gcloud, tmp_path):
        bin_dir, log, _ = mock_gcloud
        out = tmp_path / "artifacts"
        r = _run_control(["download"], bin_dir,
                         {"TPU_NAME": "t", "ZONE": "z", "OUT": str(out)})
        assert r.returncode == 0, r.stderr
        calls = log.read_text()
        assert calls.count("scp --recurse") == 2
        assert "checkpoints" in calls and "logs" in calls
        assert out.is_dir()  # mkdir -p ran

    def test_project_flag_propagates(self, mock_gcloud):
        bin_dir, log, _ = mock_gcloud
        r = _run_control(["status"], bin_dir,
                         {"TPU_NAME": "t", "ZONE": "z", "PROJECT": "proj-1"})
        assert r.returncode == 0, r.stderr
        assert "--project proj-1" in log.read_text()

    def test_setup_pushes_tracked_checkout_as_targz(self, mock_gcloud):
        """The setup path must ship the LOCAL checkout: 3 ssh calls, the
        second receiving a gzipped tar of `git ls-files` on stdin."""
        bin_dir, log, stdin_dir = mock_gcloud
        r = _run_control(["setup"], bin_dir, {"TPU_NAME": "t", "ZONE": "z"})
        assert r.returncode == 0, r.stderr
        calls = log.read_text().splitlines()
        assert len(calls) == 3
        assert "mkdir -p" in calls[0]
        assert "tar -xzf -" in calls[1]
        assert "setup_tpu_vm.sh" in calls[2]
        payload = stdin_dir / "call_2"
        assert payload.exists() and payload.stat().st_size > 1000
        with gzip.open(payload) as gz, tarfile.open(fileobj=gz, mode="r|") as tf:
            names = [m.name for m in tf]
        assert "pyproject.toml" in names
        assert any(n.startswith("vlm_bridge_tpu/") for n in names)
        assert not any(".git/" in n for n in names)  # tracked files only


@pytest.fixture()
def mock_vm(tmp_path):
    """A fake TPU-VM environment for setup_tpu_vm.sh: mocked system tools +
    a WORKDIR containing a checkout marker."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    log = tmp_path / "calls.log"
    for tool in ("sudo", "apt-get", "pip", "tmux", "vlm-data", "git",
                 "tensorboard", "vlm-training"):
        _write_mock(bin_dir, tool, f'echo "{tool} $@" >> "{log}"\nexit 0\n')
    # `python - <<PY` heredoc (snapshot download): consume stdin, succeed
    _write_mock(bin_dir, "python",
                f'echo "python $@" >> "{log}"\ncat > /dev/null\nexit 0\n')
    workdir = tmp_path / "checkout"
    workdir.mkdir()
    (workdir / "pyproject.toml").write_text("[project]\nname='x'\n")
    return bin_dir, log, workdir


class TestSetupScript:
    def _run(self, bin_dir, log, env_extra, cwd):
        env = dict(os.environ)
        env["PATH"] = f"{bin_dir}:{env['PATH']}"
        env.update(env_extra)
        return subprocess.run(
            ["bash", str(SETUP)], env=env, cwd=cwd,
            capture_output=True, text=True, timeout=120)

    def test_full_bootstrap_sequence(self, mock_vm, tmp_path):
        bin_dir, log, workdir = mock_vm
        r = self._run(bin_dir, log, {
            "WORKDIR": str(workdir), "HF_TOKEN": "tok",
            "DATA_DIR": str(tmp_path / "data"),
            "HF_MODELS_DIR": str(tmp_path / "hf"),
        }, cwd=workdir)
        assert r.returncode == 0, r.stderr + r.stdout
        calls = log.read_text()
        # ordering: deps -> python deps -> snapshots -> dataset -> tb -> train
        markers = ("apt-get", "pip ", "python -", "vlm-data transform",
                   "tmux new-session -d -s tb",
                   "tmux new-session -d -s train")
        order = [calls.find(m) for m in markers]
        assert all(i >= 0 for i in order), calls
        assert order == sorted(order), calls
        # both tmux sessions (tensorboard + train) launched
        assert "tmux new-session -d -s tb" in calls
        assert "tmux new-session -d -s train" in calls

    def test_dataset_step_skipped_when_manifest_exists(self, mock_vm, tmp_path):
        bin_dir, log, workdir = mock_vm
        data = tmp_path / "data"
        (data / "train").mkdir(parents=True)
        (data / "train" / "captions.jsonl").write_text("{}\n")
        r = self._run(bin_dir, log, {
            "WORKDIR": str(workdir), "HF_TOKEN": "tok",
            "DATA_DIR": str(data), "HF_MODELS_DIR": str(tmp_path / "hf"),
        }, cwd=workdir)
        assert r.returncode == 0, r.stderr + r.stdout
        assert "vlm-data transform" not in log.read_text()

    def test_bare_vm_without_repo_url_fails_clearly(self, mock_vm, tmp_path):
        bin_dir, log, _ = mock_vm
        empty = tmp_path / "empty"
        empty.mkdir()
        env = {k: v for k, v in os.environ.items() if k != "REPO_URL"}
        env["PATH"] = f"{bin_dir}:{env['PATH']}"
        env.update({"WORKDIR": str(empty), "HF_TOKEN": "tok",
                    "DATA_DIR": str(tmp_path / "d"),
                    "HF_MODELS_DIR": str(tmp_path / "hf"), "REPO_URL": ""})
        r = subprocess.run(["bash", str(SETUP)], env=env, cwd=empty,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode != 0
        assert "REPO_URL" in r.stderr
