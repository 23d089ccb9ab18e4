"""First-dispatch stall watchdog (utils/watchdog.py): timing mechanics,
CPU no-op, and the real relaunch-once / exit-42 process behavior."""

import os
import subprocess
import sys
import textwrap
import time

from symmetry_ode_discovery_tpu.utils.watchdog import (
    STALL_EXIT_CODE, probe_first_dispatch, run_with_watchdog)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fast_fn_does_not_fire():
    fired = []
    out = run_with_watchdog(lambda: 7, timeout_s=5.0, fire=fired.append)
    assert out == 7
    time.sleep(0.05)
    assert not fired


def test_slow_fn_fires():
    fired = []
    out = run_with_watchdog(lambda: time.sleep(0.5) or "done",
                            timeout_s=0.1, fire=lambda: fired.append(1))
    # injected fire doesn't kill the process, so fn still returns
    assert out == "done"
    assert fired == [1]


def test_probe_is_noop_on_cpu():
    # conftest forces the cpu platform; the probe must return immediately
    t0 = time.time()
    assert probe_first_dispatch(timeout_s=5.0) == 0.0
    assert time.time() - t0 < 2.0


def test_relaunch_once_then_succeed(tmp_path):
    """A process that stalls on first launch is re-exec'd by the watchdog
    and completes on the relaunch (the CLAUDE.md manual procedure, as code).
    Must be a real script file: os.execv re-runs sys.argv, which a `-c`
    invocation cannot carry."""
    script = tmp_path / "stall_once.py"
    script.write_text(textwrap.dedent("""\
        import os, sys, time
        sys.path.insert(0, %r)
        from symmetry_ode_discovery_tpu.utils.watchdog import run_with_watchdog

        def work():
            if not os.environ.get("SODT_WATCHDOG_RETRIED"):
                time.sleep(60)  # simulated pre-dispatch stall, first launch
            return "RECOVERED"

        print(run_with_watchdog(work, timeout_s=0.5))
    """ % REPO))
    env = {k: v for k, v in os.environ.items() if k != "SODT_WATCHDOG_RETRIED"}
    r = subprocess.run([sys.executable, str(script)], env=env,
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 0, r.stderr
    assert "RECOVERED" in r.stdout
    assert "relaunching self once" in r.stderr


def test_second_stall_exits_42():
    script = textwrap.dedent("""\
        import sys, time
        sys.path.insert(0, %r)
        from symmetry_ode_discovery_tpu.utils.watchdog import run_with_watchdog
        run_with_watchdog(lambda: time.sleep(60), timeout_s=0.3)
    """ % REPO)
    env = dict(os.environ, SODT_WATCHDOG_RETRIED="1")
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == STALL_EXIT_CODE
    assert "tunnel wedged" in r.stderr


def test_heartbeat_fires_without_beats():
    from symmetry_ode_discovery_tpu.utils import watchdog as wd

    fired = []
    wd.stop_heartbeat()
    wd.start_heartbeat(timeout_s=0.2, fire=lambda: fired.append(1),
                       poll_s=0.05)
    time.sleep(0.6)
    wd.stop_heartbeat()
    assert fired == [1]


def test_heartbeat_beats_keep_it_alive():
    from symmetry_ode_discovery_tpu.utils import watchdog as wd

    fired = []
    wd.stop_heartbeat()
    wd.start_heartbeat(timeout_s=0.3, fire=lambda: fired.append(1),
                       poll_s=0.05)
    for _ in range(10):
        time.sleep(0.1)
        wd.beat()
    assert not fired
    wd.stop_heartbeat()
    time.sleep(0.2)
    assert not fired  # disarmed thread must not fire


def test_heartbeat_beat_is_noop_when_unarmed():
    from symmetry_ode_discovery_tpu.utils import watchdog as wd

    wd.stop_heartbeat()
    wd.beat()  # must not raise


def test_heartbeat_relaunch_appends_resume(tmp_path):
    """Stalled first launch (no beats) -> re-exec with --resume appended;
    the relaunch sees the flag and exits cleanly."""
    script = tmp_path / "hb_stall.py"
    script.write_text(textwrap.dedent("""\
        import os, sys, time
        sys.path.insert(0, %r)
        from symmetry_ode_discovery_tpu.utils import watchdog as wd

        if "--resume" in sys.argv:
            print("RESUMED-OK")
            sys.exit(0)
        wd.start_heartbeat(timeout_s=0.3, extra_argv=["--resume"],
                           poll_s=0.05)
        time.sleep(60)   # simulated mid-run stall, no beats
    """ % REPO))
    env = {k: v for k, v in os.environ.items() if k != "SODT_WATCHDOG_RETRIED"}
    r = subprocess.run([sys.executable, str(script)], env=env,
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 0, r.stderr
    assert "RESUMED-OK" in r.stdout
    assert "relaunching self once" in r.stderr


def test_relaunch_preserves_module_invocation(tmp_path):
    """`python -m pkg.mod` must re-exec as -m (argv[0] is the module FILE in
    that case; running it as a script breaks relative imports)."""
    pkg = tmp_path / "wdpkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "helper.py").write_text("VALUE = 'FROM-RELATIVE-IMPORT'\n")
    (pkg / "mod.py").write_text(textwrap.dedent("""\
        import os, sys, time
        sys.path.insert(0, %r)
        from .helper import VALUE
        from symmetry_ode_discovery_tpu.utils import watchdog as wd

        if os.environ.get("SODT_WATCHDOG_RETRIED"):
            print("OK", VALUE)
            sys.exit(0)
        wd.start_heartbeat(timeout_s=0.3, poll_s=0.05)
        time.sleep(60)
    """ % REPO))
    env = {k: v for k, v in os.environ.items() if k != "SODT_WATCHDOG_RETRIED"}
    env["PYTHONPATH"] = str(tmp_path) + os.pathsep + REPO
    r = subprocess.run([sys.executable, "-m", "wdpkg.mod"], env=env,
                       cwd=str(tmp_path), capture_output=True, text=True,
                       timeout=30)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "OK FROM-RELATIVE-IMPORT" in r.stdout
