from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zio_analytics_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session", autouse=True)
def _sweep_stream_tmpdirs():
    """Remove the mkdtemp stream-source/staging dirs the streaming tests
    create (they outlive the queries that read them, so per-test cleanup
    would race the stream; a session-end sweep keeps /tmp clean)."""
    yield
    import glob
    import shutil

    for pat in ("stream_src_*", "stream_holt_*", "stream_hw_*",
                "stream_ewma_*", "stage_*", "llm_out_*"):
        for d in glob.glob(f"{tempfile.gettempdir()}/{pat}"):
            shutil.rmtree(d, ignore_errors=True)
