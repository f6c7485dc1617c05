import signal
import sys

import pytest

# Hard per-test ceiling. Rationale: a rare Ray actor-pool scheduling
# deadlock (observed once: dedup-pipeline attach actors parked forever
# at 99% host idle under the 4-CPU test session) would otherwise hang
# the whole suite silently; the alarm converts it into ONE failed test
# with a traceback pointing at the blocked ray.get. The slowest
# legitimate test (e2e recall) runs ~2 min on a loaded host, so 600 s
# has >4x headroom.
_TEST_TIMEOUT_S = 600


@pytest.fixture(autouse=True)
def _hang_guard(request):
    if sys.platform == "win32" or not hasattr(signal, "SIGALRM"):
        yield
        return

    def _abort(signum, frame):
        raise TimeoutError(
            f"{request.node.nodeid} exceeded {_TEST_TIMEOUT_S}s "
            "(likely a stalled Ray stage — see the traceback)"
        )

    old = signal.signal(signal.SIGALRM, _abort)
    signal.alarm(_TEST_TIMEOUT_S)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    from analiticcl_ray.sources.corpus import generate_corpus

    return generate_corpus(400, 42)


@pytest.fixture(scope="session")
def small_truth(small_corpus):
    from analiticcl_ray.pipelines.oracle import oracle_pairs

    return oracle_pairs(small_corpus)
