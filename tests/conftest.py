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
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
