"""Probe-gated TPU job launcher (tools/tpu_watchdog.py, round-4 VERDICT
next #10): the wrapper must launch the job only after a probe passes, forward
the job's exit code, and give up with exit 3 when the tunnel never unwedges.

The probe itself is monkeypatched at the subprocess boundary (PROBE_SRC is a
plain `python -c` source string), so these tests never touch a real backend.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "tpu_watchdog.py")


def _run(*extra, probe_src=None, timeout=60):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    cmd = [sys.executable, TOOL, *extra]
    if probe_src is not None:
        # swap the probe by running through -c shim that rewrites PROBE_SRC
        shim = (
            "import sys; sys.argv[0]='tpu_watchdog'; "
            f"sys.path.insert(0, {os.path.dirname(TOOL)!r}); "
            "import tpu_watchdog as w; "
            f"w.PROBE_SRC = {probe_src!r}; "
            f"sys.argv = ['tpu_watchdog'] + {list(extra)!r}; "
            "w.main()"
        )
        cmd = [sys.executable, "-c", shim]
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=timeout)


def test_forwards_job_exit_code_when_probe_passes():
    out = _run("--interval", "1", "--probe-timeout", "30", "--max-wait", "60",
               "--", sys.executable, "-c", "import sys; sys.exit(7)",
               probe_src="print('probe-ok cpu')")
    assert out.returncode == 7
    assert "tunnel healthy" in out.stdout
    assert "launching:" in out.stdout


def test_gives_up_with_exit_3_when_probe_never_passes():
    out = _run("--interval", "0.2", "--probe-timeout", "5", "--max-wait", "1",
               "--", sys.executable, "-c", "print('never runs')",
               probe_src="print('still wedged')")
    assert out.returncode == 3
    assert "never runs" not in out.stdout
    assert "giving up" in out.stdout


def test_hung_probe_counts_as_wedged():
    out = _run("--interval", "0.2", "--probe-timeout", "0.5", "--max-wait", "2",
               "--", sys.executable, "-c", "print('never runs')",
               probe_src="import time; time.sleep(60)")
    assert out.returncode == 3
    assert "failed/hung" in out.stdout


def test_requires_a_command():
    out = _run("--max-wait", "1")
    assert out.returncode == 2  # argparse error
