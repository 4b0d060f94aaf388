"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest run."""

from __future__ import annotations

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "driver_gate: the in-suite sf0.001 mirror of the driver's "
        "50-entry correctness gate (deselect with -m 'not driver_gate')")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    owns = not ray.is_initialized()
    if owns:
        import olx_ray

        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 runtime_env={"worker_process_setup_hook":
                              olx_ray.make_worker_log_silencer()})
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    if owns:   # never shut down a session an outer caller owns
        ray.shutdown()


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("olx_ray"))
