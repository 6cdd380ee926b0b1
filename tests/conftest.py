import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pandarus_spark.session import build_session

    s = build_session(app="pandarus-spark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# Reference golden constants (FIXTURES.md §4, /root/reference/tests)
ONE_DEGREE = 4e7 / 360.0
CELL_AREA = ONE_DEGREE ** 2

GOLDEN_GRID_SQUARE = {
    ("grid cell 0", "single"): 3097719886.0413523,
    ("grid cell 1", "single"): 3097248058.207055,
    ("grid cell 2", "single"): 3097719886.041353,
    ("grid cell 3", "single"): 3097248058.207057,
}
