"""Subprocess isolation for multi-device interpret-mode Pallas tests.

Why: interpret-mode pallas calls end with an ``io_callback`` running
``_clean_up_shared_memory``, which blocks on a
``threading.Barrier(num_devices)`` (jax/_src/pallas/mosaic/interpret/
interpret_pallas_call.py:237-240). With >1 virtual device the runtime
sometimes serializes both devices' ordered callbacks onto one thread: the
first blocks on the barrier the second can never reach, and the runtime
aborts the whole process (``Fatal Python error: Aborted`` — captured with
faulthandler, round 5: one thread in ``clean_up_barrier.wait``, the main
thread in the result fetch). Single-device interpret tests are immune
(barrier parties == 1), which is why only the shard_map interpret tests
ever crashed.

Nothing in-process can fix the runtime's callback thread assignment, so
each affected test body runs in a forked pytest child; the nondeterministic
abort (measured ~1-in-3) is retried, genuine failures propagate with the
child's output, and a child that aborts AFTER its test passed counts as a
pass.
"""

import functools
import os
import subprocess
import sys

_CHILD_ENV = "DDIM_ISOLATED_CHILD"
_MAX_ATTEMPTS = 4


def _looks_aborted(proc: subprocess.CompletedProcess) -> bool:
    text = (proc.stdout or "") + (proc.stderr or "")
    return (
        proc.returncode < 0
        or proc.returncode == 134
        or "Fatal Python error" in text
    )


def isolate_subprocess(fn):
    """Run this test in a pytest child process, retrying interpreter aborts.

    The wrapped body still executes normally inside the child (the env var
    breaks the recursion), so fixtures/parametrization keep working.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get(_CHILD_ENV):
            return fn(*args, **kwargs)

        test_file = sys.modules[fn.__module__].__file__
        nodeid = f"{test_file}::{fn.__name__}"
        env = dict(os.environ, **{_CHILD_ENV: "1"})
        last = None
        for attempt in range(1, _MAX_ATTEMPTS + 1):
            proc = subprocess.run(
                [
                    sys.executable, "-m", "pytest", nodeid,
                    "-q", "-x", "-o", "addopts=", "-p", "no:cacheprovider",
                ],
                capture_output=True,
                text=True,
                env=env,
                timeout=900,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            if proc.returncode == 0:
                return
            # the abort can fire in teardown after the test body passed
            if _looks_aborted(proc) and "1 passed" in proc.stdout:
                return
            if not _looks_aborted(proc):
                raise AssertionError(
                    f"isolated child failed (rc={proc.returncode}):\n"
                    f"{proc.stdout}\n{proc.stderr}"
                )
            last = proc
        raise AssertionError(
            f"isolated child aborted {_MAX_ATTEMPTS} times "
            f"(interpret-mode cleanup race, see tests/_isolate.py):\n"
            f"{last.stdout}\n{last.stderr}"
        )

    return wrapper
