"""DelayedObjects unit tests (reference DaskDelayedObjects semantics,
src/dask_obj/core.py:116-220)."""

import time

from dask_obj_spark.delayed import DelayedObjects


class Point:
    def __init__(self, x, y):
        self.x, self.y = x, y

    def norm(self):
        return (self.x**2 + self.y**2) ** 0.5


def test_lazy_by_default():
    calls = []
    d = DelayedObjects([1, 2, 3]).map(lambda x: calls.append(x) or x * 2)
    assert calls == []  # nothing ran yet
    assert d.compute() == [2, 4, 6]
    assert sorted(calls) == [1, 2, 3]


def test_eager_submission():
    calls = []
    d = DelayedObjects([1, 2], eager=True).map(lambda x: calls.append(x) or x)
    time.sleep(0.3)
    assert sorted(calls) == [1, 2]  # ran without compute()


def test_attr_item_call_broadcast():
    pts = DelayedObjects([Point(3, 4), Point(6, 8)])
    assert pts.x.compute() == [3, 6]
    assert pts.call("norm").compute() == [5.0, 10.0]
    dicts = DelayedObjects([{"k": 1}, {"k": 2}])
    assert dicts["k"].compute() == [1, 2]


def test_callables_invocation():
    fns = DelayedObjects([str.upper, str.lower])
    assert fns("MiX").compute() == ["MIX", "mix"]


def test_completion_order_iteration():
    d = DelayedObjects([0.2, 0.05, 0.1]).map(lambda s: (time.sleep(s), s)[1])
    completion = list(d)
    assert completion == [0.05, 0.1, 0.2]  # fastest first
    assert d.compute() == [0.2, 0.05, 0.1]  # original order preserved


def test_len_without_compute():
    assert len(DelayedObjects([1, 2, 3])) == 3


def test_operator_broadcasting():
    d = DelayedObjects([1, 2, 3])
    assert ((d + 1) * 2).compute() == [4, 6, 8]
    assert (10 - d).compute() == [9, 8, 7]
    assert (-d).compute() == [-1, -2, -3]
    assert (d >= 2).compute() == [False, True, True]


def test_operator_between_collections():
    a = DelayedObjects([1, 2, 3])
    b = DelayedObjects([10, 20, 30])
    assert (a + b).compute() == [11, 22, 33]


def test_map_item_first_arg_order():
    # deliberate fix: the reference curries extra args BEFORE the item
    d = DelayedObjects(["a", "b"]).map(lambda item, suffix: item + suffix, "!")
    assert d.compute() == ["a!", "b!"]


def test_eager_chain_runs_each_stage_once():
    # a k-step eager chain must execute each step once per item (derive
    # over parent futures), not re-run the chain from the seed per stage
    import threading

    calls = []
    lock = threading.Lock()

    def step1(x):
        with lock:
            calls.append(("s1", x))
        return x * 10

    def step2(x):
        with lock:
            calls.append(("s2", x))
        return x + 1

    d = DelayedObjects([1, 2, 3], eager=True)
    out = d.map(step1).map(step2).compute()
    assert out == [11, 21, 31]
    assert sorted(calls) == [("s1", 1), ("s1", 2), ("s1", 3), ("s2", 10), ("s2", 20), ("s2", 30)]


def test_lazy_binary_op_memoizes_operands():
    # the same operand collection used in several combined thunks runs once
    calls = []
    base = DelayedObjects([1, 2]).map(lambda x: (calls.append(x), x * 2)[1])
    tot = (base + base).compute()
    assert tot == [4, 8]
    assert sorted(calls) == [1, 2]


def test_eager_binary_op_uses_futures_once():
    calls = []
    a = DelayedObjects([1, 2], eager=True).map(lambda x: (calls.append(x), x)[1])
    b = DelayedObjects([10, 20], eager=True)
    assert (a + b).compute() == [11, 22]
    assert sorted(calls) == [1, 2]
