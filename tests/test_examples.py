"""Example STARKs end-to-end at CPU-test-friendly sizes (the reference's
examples-as-tests pattern, SURVEY.md section 4)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples import mimc, fibonacci, demo_static   # noqa: E402
from genstark_tpu.field import P128, P256           # noqa: E402


def test_mimc_small_input_variant():
    # light query counts: the reference's perf options (ext=16/exe=48/fri=24)
    # are exercised on the real chip by bench.py; here the path coverage is
    # what matters and compile time is the cost driver
    stats = mimc.run(steps=2 ** 6, options={"extension_factor": 8,
                                            "exe_query_count": 12,
                                            "fri_query_count": 8})
    assert stats["security_level"] > 0


def test_mimc_small_assembly_variant():
    stats = mimc.run(steps=2 ** 6, use_input=False,
                     options={"extension_factor": 8, "exe_query_count": 12,
                              "fri_query_count": 8})
    assert stats["security_level"] > 0


@pytest.mark.slow
def test_mimc_256bit():
    stats = mimc.run(steps=2 ** 5, modulus=P256,
                     options={"hash_algorithm": "sha256", "extension_factor": 8,
                              "exe_query_count": 16, "fri_query_count": 8})
    assert stats["proof_bytes"] > 0


def test_fibonacci_expected_result():
    stats = fibonacci.run(steps=2 ** 6)
    assert stats["security_level"] > 0


def test_demo_static_variables():
    stats = demo_static.run()
    assert stats["proof_bytes"] > 0
