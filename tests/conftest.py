import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (never per-test)."""
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def clips_tiny(tmp_path_factory):
    """Deterministic tiny clips table with injected violations + goldens."""
    from ndap_data_validator_ray.sources.synthetic import ClipTableSpec, write_clips_dataset

    d = str(tmp_path_factory.mktemp("clips_tiny"))
    spec = ClipTableSpec(n_rows=600, n_files=6, hot_dup_copies=15)
    goldens = write_clips_dataset(d, spec, overwrite=True)
    return d, spec, goldens


@pytest.fixture(scope="session")
def clips_clean(tmp_path_factory):
    """Violation-free clips table (for baselines / fidelity)."""
    from ndap_data_validator_ray.sources.synthetic import ClipTableSpec, write_clips_dataset

    d = str(tmp_path_factory.mktemp("clips_clean"))
    spec = ClipTableSpec(n_rows=300, n_files=4, inject_violations=False)
    goldens = write_clips_dataset(d, spec, overwrite=True)
    return d, spec, goldens
