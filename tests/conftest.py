"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest

REFERENCE_TESTDATA = "/root/reference/src/main/fst/testdata"
SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def ref_words() -> list[str]:
    """The reference's 82k-word English test dictionary (set mode)."""
    path = f"{REFERENCE_TESTDATA}/fst_test_dict2.txt"
    return [l.strip() for l in open(path, encoding="utf-8") if l.strip()]


@pytest.fixture(scope="session")
def golden_lev() -> list[str]:
    path = f"{REFERENCE_TESTDATA}/fst_test_dict2_standard.txt"
    return [l.strip() for l in open(path, encoding="utf-8") if l.strip()]


@pytest.fixture(scope="session")
def golden_dl() -> list[str]:
    path = f"{REFERENCE_TESTDATA}/fst_test_dict3_standard.txt"
    return [l.strip() for l in open(path, encoding="utf-8") if l.strip()]
