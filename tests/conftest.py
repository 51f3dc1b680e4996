import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        # 4 CPUs: 8 halves the oracle sweep's wall time but one measured run
        # died mid-suite (memory pressure: the CLI tests spawn their own Ray
        # sessions on top) — stability wins; raise via GRAFT_TEST_CPUS when
        # hunting speed interactively
        num_cpus=int(os.environ.get("GRAFT_TEST_CPUS", "4")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
