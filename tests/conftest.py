import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from ragflow_core16_spark.session import get_spark
    s = get_spark("local[4]", app_name="tests",
                  extra_conf={"spark.sql.shuffle.partitions": "8",
                              "spark.ui.enabled": "false"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def formatted_plan(df) -> str:
    """Shared explain("formatted") helper for plan-audit tests."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
