import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_fixture(tmp_path_factory):
    """Shared t1 fixture: (root, registry, metas, info)."""
    from tiflow_ray import fixtures
    root = str(tmp_path_factory.mktemp("t1"))
    reg, metas, info = fixtures.generate_tier(root, "t1")
    return root, reg, metas, info


@pytest.fixture(scope="session")
def t1_noddl_fixture(tmp_path_factory):
    from tiflow_ray import fixtures
    root = str(tmp_path_factory.mktemp("t1n"))
    reg, metas, info = fixtures.generate_tier(root, "t1_noddl")
    return root, reg, metas, info
