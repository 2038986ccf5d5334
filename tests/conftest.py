import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jemalloc's arena churn causes a VM-wide TLB-shootdown storm under
# multi-process Arrow load (see ocr_ray.__init__._configure_arrow_memory_pool)
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (driver instruction)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()
