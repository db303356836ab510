"""Probe-gated TPU job launcher (round-4 VERDICT next #10).

The sandbox's remote-TPU tunnel wedges intermittently (observed >40 min,
CLAUDE.md): even a tiny matmul hangs on a futex, and launching a long job
into a wedged tunnel silently loses hours. This wrapper probes the tunnel
with a tiny matmul in a FRESH interpreter (a wedge poisons whole processes,
so probing in-process proves nothing) under a hard timeout, and only launches
the real job once a probe passes.

Usage:
    python tools/tpu_watchdog.py [--interval 120] [--probe-timeout 90] \
        [--max-wait 3600] -- <command> [args...]

Exits with the job's exit code; exits 3 if the tunnel never unwedged within
--max-wait. The probe subprocess is plain single-shot JAX (no compile cache
interaction worth noting: the probe matmul is trivially cached after the
first pass).
"""
import argparse
import subprocess
import sys
import time

PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "(x @ x + 1.0).block_until_ready();"
    "print('probe-ok', jax.devices()[0].platform)"
)


def probe(timeout_s: float) -> bool:
    try:
        out = subprocess.run([sys.executable, "-c", PROBE_SRC],
                             capture_output=True, text=True, timeout=timeout_s)
        return out.returncode == 0 and "probe-ok" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel(interval: float, probe_timeout: float, max_wait: float) -> bool:
    t0 = time.time()
    attempt = 0
    while time.time() - t0 < max_wait:
        attempt += 1
        t_probe = time.time()
        if probe(probe_timeout):
            print(f"[tpu_watchdog] tunnel healthy (probe {attempt}, "
                  f"{time.time() - t_probe:.1f}s)", flush=True)
            return True
        print(f"[tpu_watchdog] probe {attempt} failed/hung after "
              f"{time.time() - t_probe:.1f}s — tunnel wedged; retrying in "
              f"{interval:.0f}s ({time.time() - t0:.0f}s elapsed)", flush=True)
        time.sleep(interval)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=120.0,
                    help="seconds between probes while wedged")
    ap.add_argument("--probe-timeout", type=float, default=90.0,
                    help="per-probe hard timeout (first-ever probe compiles; "
                         "90 s covers it)")
    ap.add_argument("--max-wait", type=float, default=3600.0,
                    help="give up after this many seconds of wedge")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to launch once the tunnel is healthy")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: tpu_watchdog.py [opts] -- cmd ...)")

    if not wait_for_tunnel(args.interval, args.probe_timeout, args.max_wait):
        print(f"[tpu_watchdog] tunnel still wedged after {args.max_wait:.0f}s "
              f"— giving up", flush=True)
        sys.exit(3)

    print(f"[tpu_watchdog] launching: {' '.join(cmd)}", flush=True)
    sys.exit(subprocess.run(cmd).returncode)


if __name__ == "__main__":
    main()
