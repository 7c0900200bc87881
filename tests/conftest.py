import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from pysearchlite_spark.session import get_spark
    s = get_spark("pysearchlite-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


def pytest_configure(config):
    # register the timeout mark so it is never a silent no-op: with
    # pytest-timeout installed that plugin enforces it; without it (this
    # sandbox has no network) the SIGALRM hook below does
    config.addinivalue_line(
        "markers",
        "timeout(seconds): fail the test if it runs longer than `seconds` "
        "(enforced by pytest-timeout when installed, else by a SIGALRM "
        "fallback in conftest — a hung readStream must not block the "
        "suite forever)")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    m = item.get_closest_marker("timeout")
    enforce = (m is not None
               and not item.config.pluginmanager.hasplugin("timeout"))
    if enforce:
        import signal

        secs = int(m.args[0]) if m.args else int(m.kwargs.get("timeout", 0))

        def _onalarm(signum, frame):
            raise TimeoutError(
                f"test exceeded its timeout mark of {secs}s")

        old = signal.signal(signal.SIGALRM, _onalarm)
        signal.alarm(secs)
    try:
        yield
    finally:
        if enforce:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
