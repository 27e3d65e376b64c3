import pandas as pd
import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (local, 4 CPUs)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture()
def dataframe10():
    from tests.goldens import DATA10, SCHEMA10

    return pd.DataFrame(columns=SCHEMA10, data=DATA10)
