"""First-dispatch stall watchdog (round-5 verdict item 7).

The axon TPU tunnel occasionally wedges a freshly-launched process BEFORE its
first dispatch completes: the process sits at ~0 CPU with no output for 10+
minutes while a throwaway probe from a NEW process succeeds (seen repeatedly
in rounds 3-4; the same first dispatch measured 4.4 s / 5.2 s / 144 s /
459 s / stuck-forever across identical runs). The manual procedure was
"kill and relaunch, budget one retry" (CLAUDE.md) — this module turns it
into code.

`probe_first_dispatch()` runs a representative first dispatch (a ~32 MB
host->device transfer, the same shape of work the LaLiGAN materialize stall
was observed on) under a watchdog thread. The stuck state lives inside an
uninterruptible PJRT C++ call, so SIGALRM/KeyboardInterrupt can't recover
it; instead the watchdog thread either

  - re-execs the SAME command line once (os.execv survives stuck threads —
    the syscall replaces the whole process image), marked via
    SODT_WATCHDOG_RETRIED so a second stall doesn't loop forever, or
  - exits with the distinct code 42 if this IS the relaunch.

Long-running CLIs (cli/main.py, cli/main_gp.py) call this right after arg
parsing; their sweeps already resume from persisted per-seed npzs by
default, so the relaunch continues where the stuck attempt left off.
"""

from __future__ import annotations

import os
import sys
import threading

STALL_EXIT_CODE = 42
_RETRY_ENV = "SODT_WATCHDOG_RETRIED"


def _default_fire(extra_argv=()):
    """Relaunch this exact command line once; exit 42 on the second stall."""
    if os.environ.get(_RETRY_ENV):
        sys.stderr.write(
            "watchdog: dispatch stalled again after relaunch; "
            f"exiting {STALL_EXIT_CODE} (axon tunnel wedged)\n")
        sys.stderr.flush()
        os._exit(STALL_EXIT_CODE)
    sys.stderr.write(
        "watchdog: no dispatch progress in time "
        "(tunnel dispatch stall, CLAUDE.md); relaunching self once\n")
    sys.stderr.flush()
    os.environ[_RETRY_ENV] = "1"
    argv = [sys.executable] + _self_argv()
    for a in extra_argv:
        if a not in argv:
            argv.append(a)
    try:
        os.execv(sys.executable, argv)
    except OSError:  # argv[0] not re-execable — fall back to the exit code
        os._exit(STALL_EXIT_CODE)


def _self_argv():
    """argv (sans interpreter) that re-runs this process. For `python -m
    pkg.mod`, sys.argv[0] is the module FILE path — re-exec'ing it as a
    script breaks relative imports (observed on the first real heartbeat
    save) — so reconstruct the -m form from __main__.__spec__."""
    spec = getattr(sys.modules.get("__main__"), "__spec__", None)
    if spec is not None and spec.name:
        name = spec.name
        if name.endswith(".__main__"):
            name = name[: -len(".__main__")]
        return ["-m", name] + sys.argv[1:]
    return list(sys.argv)


def run_with_watchdog(fn, timeout_s: float, fire=None):
    """Run `fn()` in the main thread; if it hasn't returned after timeout_s,
    invoke `fire` (default: relaunch-once-then-exit-42) from a daemon thread.

    Returns fn()'s result when it completes in time. `fire` is injectable
    for tests.
    """
    fire = _default_fire if fire is None else fire
    done = threading.Event()

    def _watch():
        if not done.wait(timeout_s):
            fire()

    t = threading.Thread(target=_watch, daemon=True, name="dispatch-watchdog")
    t.start()
    try:
        return fn()
    finally:
        done.set()


def probe_first_dispatch(timeout_s: float = 600.0, nbytes: int = 32 << 20,
                         fire=None) -> float:
    """Force this process's first device dispatch under a watchdog.

    Transfers an `nbytes` zeros array host->device and blocks on it — the
    representative operation the pre-dispatch stall was measured on. Returns
    the probe's wall clock (seconds) so callers can log tunnel weather.
    A process whose first dispatch completed has left the stall window; the
    later worker-restart failure mode raises FAILED_PRECONDITION instead and
    is handled by the per-chunk retry + npz-resume logic.
    """
    import time

    if os.environ.get("SODT_NO_WATCHDOG"):
        return 0.0
    env_t = os.environ.get("SODT_WATCHDOG_TIMEOUT")
    if env_t:
        timeout_s = float(env_t)

    def _probe():
        # the jax import / backend init runs INSIDE the watchdog on purpose:
        # a full tunnel outage blocks `jax.devices()` itself (CLAUDE.md)
        import jax
        import numpy as np

        if jax.default_backend() == "cpu":
            return 0.0  # no tunnel, nothing to stall (tests, CPU sweeps)
        t0 = time.time()
        a = jax.device_put(np.zeros(nbytes // 4, np.float32))
        a.block_until_ready()
        del a
        return time.time() - t0

    dt = run_with_watchdog(_probe, timeout_s, fire=fire)
    if dt > 30.0:
        print(f"watchdog: first dispatch took {dt:.1f} s (slow tunnel)",
              file=sys.stderr)
    return dt


# ---------------------------------------------------------------------------
# Heartbeat watchdog. The probe alone is NOT sufficient: the stall is
# stochastic per dispatch, so a run whose probe succeeded can still wedge on
# a LATER early dispatch (observed round 5: a LaLiGAN train stuck at 3 s CPU
# for 25 min with the probe long done). The training loops feed `beat()` at
# natural progress points (per epoch / host step / chunk); if no beat lands
# within the window, the same relaunch-once-then-exit-42 action fires.
# ---------------------------------------------------------------------------

_hb = {"last": None, "thread": None, "timeout": 0.0, "fire": None}


def beat() -> None:
    """Record progress. No-op unless start_heartbeat() armed the watchdog."""
    if _hb["last"] is not None:
        import time

        _hb["last"] = time.time()


def start_heartbeat(timeout_s: float = 900.0, extra_argv=(), fire=None,
                    poll_s: float = 15.0) -> None:
    """Arm the liveness watchdog for the rest of the process.

    extra_argv: flags appended on self-relaunch when absent (e.g.
    ["--resume"] so an interrupted LaLiGAN train continues from its
    snapshot; sweeps resume from per-seed npzs without flags).
    """
    import threading
    import time

    if os.environ.get("SODT_NO_WATCHDOG") or _hb["thread"] is not None:
        return
    # SODT_WATCHDOG_TIMEOUT overrides for runs where the caller knows the
    # legitimate first-beat gap (e.g. orchestration scripts trading a rare
    # false kill for fast stall recovery — relaunches resume cheaply)
    env_t = os.environ.get("SODT_WATCHDOG_TIMEOUT")
    if env_t:
        timeout_s = float(env_t)
    _hb["last"] = time.time()
    _hb["timeout"] = timeout_s
    _hb["fire"] = fire if fire is not None else (
        lambda: _default_fire(extra_argv))

    def _watch():
        while True:
            time.sleep(poll_s)
            last = _hb["last"]
            if last is None:
                return  # disarmed
            if time.time() - last > _hb["timeout"]:
                _hb["fire"]()
                return  # injected test fire doesn't exit — don't spin

    t = threading.Thread(target=_watch, daemon=True, name="heartbeat-watchdog")
    t.start()
    _hb["thread"] = t


def stop_heartbeat() -> None:
    _hb["last"] = None
    _hb["thread"] = None
