"""data_utils + collectives tests (incl. shard_map all_gather gradient)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.data.data_utils import (
    ChainDataset,
    ConcatDataset,
    concat_datasets,
    prepare_sample,
    reorg_datasets_by_split,
)
from stllm_tpu.parallel.collectives import all_gather_with_grad, concat_all_gather


class Rng:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_concat_dataset():
    ds = ConcatDataset([Rng([1, 2]), Rng([3, 4, 5])])
    assert len(ds) == 5
    assert [ds[i] for i in range(5)] == [1, 2, 3, 4, 5]
    shared = ConcatDataset.shared_key_samples(
        [{"a": 1, "b": 2}, {"a": 3, "c": 4}])
    assert shared == [{"a": 1}, {"a": 3}]


def test_chain_dataset_ratios():
    def inf(tag):
        while True:
            yield tag

    c = iter(ChainDataset([inf("x"), inf("y")], ratios=[1, 9], seed=0))
    draws = [next(c) for _ in range(200)]
    assert draws.count("y") > 150


def test_reorg_and_concat():
    d1, d2 = Rng([1]), Rng([2, 3])
    reorg = reorg_datasets_by_split({"a": {"train": d1}, "b": {"train": d2}})
    assert len(reorg["train"]) == 2
    merged = concat_datasets(reorg)
    assert len(merged["train"]) == 3


def test_prepare_sample_device():
    out = prepare_sample({"x": np.ones((2, 2)), "label": "keep"})
    assert isinstance(out["x"], jax.Array)
    assert out["label"] == "keep"


def test_all_gather_with_grad_shard_map():
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("d",))
    x = jnp.arange(8.0).reshape(4, 2)

    def f(xs):
        g = all_gather_with_grad(xs, "d")          # (4, 2) gathered
        return ((g ** 2).sum()).reshape(1)         # per-device loss

    fn = jax.shard_map(f, mesh=mesh, in_specs=(P("d"),), out_specs=P("d"))

    per_dev = fn(x)                                 # (4,)
    np.testing.assert_allclose(np.asarray(per_dev), float((x ** 2).sum()),
                               rtol=1e-6)
    # every device's loss sees every element through the gather, so the total
    # gradient is 4 * 2x — gradients FLOW through the collective
    grads = jax.grad(lambda x: fn(x).sum())(x)
    np.testing.assert_allclose(np.asarray(grads), 8 * np.asarray(x), rtol=1e-6)


def test_concat_all_gather_no_grad():
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:2]
    mesh = Mesh(np.array(devs), ("d",))
    x = jnp.ones((2, 2))

    def f(xs):
        return (concat_all_gather(xs, "d") ** 2).sum().reshape(1)

    fn = jax.shard_map(f, mesh=mesh, in_specs=(P("d"),), out_specs=P("d"))
    grads = jax.grad(lambda x: fn(x).sum())(x)
    np.testing.assert_allclose(np.asarray(grads), 0.0)
