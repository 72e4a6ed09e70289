from __future__ import annotations

import pytest

from ida_ice_energy_simulation_etl_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_TEST_SHUFFLE_PARTITIONS: partitioning-invariance sweep
    # knob — rerun the whole suite (or just test_oracle_parity.py) under
    # an adversarial partition count, e.g. 37, to prove no result
    # depends on the data's physical layout.
    import os

    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_TEST_SHUFFLE_PARTITIONS", "8")
        ),
        # One JVM serves all ~530 tests; at the 1 GiB driver default the
        # storage held by the iterative kernels' live checkpoints plus a
        # concurrent AQE broadcast build can collide ("Not enough memory
        # to build and broadcast", seen flaky on degree_assortativity at
        # sf0.1 once its hints were removed).  The kernels now release
        # superseded rounds eagerly (free_local_checkpoint); the larger
        # heap removes the residual coincidence-of-peaks flake.
        extra_conf={"spark.driver.memory": "3g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
