"""Collective helpers (parity with gsplat/distributed.py:10-360).

The reference wraps NCCL with variable-length list collectives; on TPU
these are jax.lax collectives inside shard_map with static capacities.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from tdgs.parallel import comm, make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs the virtual multi-device mesh"
)


def _run(fn, *args, out_specs=P("gauss")):
    mesh = make_mesh()
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(P("gauss"),) * len(args),
        out_specs=out_specs, check_vma=False,
    )(*args)


def test_all_gather_concats_shards():
    D = jax.device_count()
    x = jnp.arange(D * 2, dtype=jnp.float32).reshape(D * 2, 1)

    def f(x):
        g = comm.all_gather(x)  # every device sees the full array
        return g[None]  # [1, N, 1] per device

    out = _run(f, x)  # [D, N, 1]
    for d in range(D):
        np.testing.assert_array_equal(np.asarray(out[d]), np.asarray(x))


def test_all_to_all_transposes_blocks():
    D = jax.device_count()
    # x[i, j] = block owned by device i destined for device j
    x = jnp.arange(D * D, dtype=jnp.float32).reshape(D * D, 1)

    def f(x):  # local [D, 1]: row j = my block for device j
        return comm.all_to_all(x, split_axis=0, concat_axis=0)

    out = np.asarray(_run(f, x)).reshape(D, D)
    np.testing.assert_array_equal(out, np.arange(D * D).reshape(D, D).T)


def test_all_reduce_sum_and_rank():
    D = jax.device_count()
    x = jnp.ones((D, 1), jnp.float32)

    def f(x):
        s = comm.all_reduce_sum(x.sum())
        r = comm.world_rank().astype(jnp.float32)
        w = jnp.float32(comm.world_size())
        return jnp.stack([s, r, w])[None]

    out = np.asarray(_run(f, x))  # [D, 3]
    np.testing.assert_array_equal(out[:, 0], np.full(D, D))
    np.testing.assert_array_equal(out[:, 1], np.arange(D))
    np.testing.assert_array_equal(out[:, 2], np.full(D, D))


def test_tensor_list_variants():
    D = jax.device_count()
    a = jnp.arange(D, dtype=jnp.float32).reshape(D, 1)
    b = jnp.arange(D * 2, dtype=jnp.float32).reshape(D * 2, 1)

    def f(a, b):
        ga, gb = comm.all_gather_tensor_list([a, b])
        return ga[None], gb[None]

    mesh = make_mesh()
    ga, gb = jax.shard_map(
        f, mesh=mesh, in_specs=(P("gauss"), P("gauss")),
        out_specs=(P("gauss"), P("gauss")), check_vma=False,
    )(a, b)
    np.testing.assert_array_equal(np.asarray(ga[0]), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(gb[-1]), np.asarray(b))
