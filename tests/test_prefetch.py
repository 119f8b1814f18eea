"""Prefetch iterator: ordering, transfer hook, exception propagation."""

import time

import pytest

from onebit_asr_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_transfers():
    out = list(prefetch(range(10), transfer=lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(10)]


def test_prefetch_overlaps():
    """Producer works ahead while the consumer is slow."""
    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    first = next(it)
    time.sleep(0.05)  # give the worker time to run ahead
    assert first == 0
    assert len(produced) >= 3  # got ahead of the consumer
    assert list(it) == [1, 2, 3, 4]


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick
